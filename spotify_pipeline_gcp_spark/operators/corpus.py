"""End-to-end corpus preparation: the composite DAG a training-data
pipeline actually runs, built from this package's own primitives.

``prepare_corpus`` chains
    quality filter  ->  exact dedup  ->  deterministic split assign
over a documents table. Each stage is one of the already-verified
operators (``operators/text.py`` feature exprs, ``operators/dedup.py``
digest dedup, ``operators/sampling.py`` digest splits) — the point of
this module is the COMPOSITION: proving the stages fuse into one lean
distributed plan rather than three materialized passes.

Scale shape (100 TB): the quality filter is a shuffle-free projection
+ predicate sitting directly on the scan (Catalyst prunes unread
columns and pushes nothing across the wire); the dedup moves payload
rows across exactly one hash shuffle; split assignment is again
shuffle-free (a pure function of ``doc_id``). Total: ONE wide shuffle
of surviving payloads plus one tiny digest-aggregate shuffle —
the minimum any content-global dedup needs.

Filters use integer-exact arithmetic (token counts, digit counts) so
membership is bit-identical across engines — float-threshold filters
can flip rows at the boundary between engines and silently diverge a
100 TB job from its spec (cf. qt2, where float SCORES are oracle-safe
because they are outputs, not membership predicates).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spotify_pipeline_gcp_spark.operators.dedup import exact_dedup
from spotify_pipeline_gcp_spark.operators.sampling import assign_splits


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_digit_ratio: tuple[int, int] = (1, 5),
) -> DataFrame:
    """Web-corpus quality gate with integer-exact predicates.

    Keeps documents with at least ``min_tokens`` whitespace tokens and
    a digit density of at most ``max_digit_ratio`` (num, den) of the
    characters (default 1/5 = 20% — the standard boilerplate/
    table-dump filter), compared cross-multiplied in integers. Adds
    ``n_tokens`` (reused downstream for token accounting) and prunes
    nothing else: a single-pass narrow operator.
    """
    num, den = max_digit_ratio
    toks = F.split(F.col(text_col), " ", -1)
    out = df.withColumn("n_tokens", F.size(toks).cast("long")).withColumn(
        "digit_chars",
        F.length(F.regexp_replace(F.col(text_col), "[^0-9]", "")).cast("long"),
    )
    return out.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("digit_chars") * den <= F.length(F.col(text_col)) * num)
    )


def prepare_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: Mapping[str, float] | None = None,
    salt: str = "cp1:",
    min_tokens: int = 10,
) -> DataFrame:
    """Quality-filter, exact-dedup, and split-assign a document table.

    Returns the surviving rows with ``n_tokens``, ``digit_chars`` and
    ``split`` columns added. Dedup keeps the lowest id per content
    digest AMONG THE FILTERED ROWS (filter-then-dedup: a kept
    low-quality copy must not shadow a surviving high-quality one).
    Split assignment is content-addressed (md5 of salted id), so the
    train/val/test membership of a document never changes when the
    corpus grows — the property that prevents cross-version
    train/test leakage.
    """
    filtered = quality_filter(df, text_col, min_tokens=min_tokens)
    deduped = exact_dedup(filtered, id_col, text_col)
    w = dict(weights) if weights else {"train": 0.8, "val": 0.1, "test": 0.1}
    return assign_splits(deduped, id_col, w, salt=salt)


def token_shard_packing(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    block_width: int = 64,
    with_offsets: bool = False,
) -> DataFrame:
    """Pack documents into training shards by cumulative token budget:
    (id, n_tokens, shard_id), documents taken in id order, a new shard
    each time the running token count crosses ``budget`` — the
    sequence-packing step that turns a filtered corpus into
    fixed-size training inputs.

    The global running sum is computed as a TWO-LEVEL prefix sum, not
    a single global window (an unpartitioned ``ORDER BY`` window is a
    one-reducer bottleneck — the whole corpus would sort through one
    task):

    1. block partials: documents group by ``id div block_width``; one
       hash aggregate gives each block's token sum;
    2. block offsets: an exclusive running sum over the tiny block-
       sum table (n/block_width rows — the only ordered pass, over
       aggregates, not documents);
    3. per-document prefix: an exclusive within-block window (bounded
       by ``block_width`` rows per group) plus the block offset,
       joined back by block id (broadcast at any realistic scale).

    Every step is deterministic (integer sums, id order), so the
    assignment is oracle-checkable against a plain global-window SQL
    replay; at 100 TB pick ``block_width`` so the block table stays
    driver-broadcastable (~1e6 blocks) while within-block windows stay
    cache-sized.

    ``with_offsets=True`` adds the sequence-ASSEMBLY manifest columns
    a training loader actually consumes: ``offset_in_shard`` (where
    the document's tokens start inside its shard's token budget) and
    ``spills`` (whether the document crosses the shard boundary —
    the loader's truncate/continue decision). Pure integer arithmetic
    on the same prefix sum; no extra pass.
    """
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ", -1)).cast("long").alias("n_tokens"),
    ).withColumn("block", F.expr(f"doc_id div {block_width}"))
    block_sums = toks.groupBy("block").agg(
        F.sum("n_tokens").alias("block_tokens")
    )
    w_blocks = W.orderBy("block").rowsBetween(W.unboundedPreceding, -1)
    offsets = block_sums.select(
        "block",
        F.coalesce(F.sum("block_tokens").over(w_blocks), F.lit(0)).alias(
            "block_offset"
        ),
    )
    w_in = (
        W.partitionBy("block")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    packed = toks.join(F.broadcast(offsets), "block").withColumn(
        "before",
        F.col("block_offset")
        + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)),
    )
    cols = [
        F.col("doc_id"),
        F.col("n_tokens"),
        F.expr(f"before div {budget}").alias("shard_id"),
    ]
    if with_offsets:
        cols += [
            F.expr(f"before % {budget}").alias("offset_in_shard"),
            (F.expr(f"before % {budget}") + F.col("n_tokens")
             > F.lit(budget)).alias("spills"),
        ]
    return packed.select(*cols)


def prepare_corpus_observed(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
):
    """``prepare_corpus`` with free run accounting: returns
    (prepared_df, Observation). The observation rides the SAME action
    that consumes the frame (a sink write, typically) and yields
    {n_docs, total_tokens} afterwards — no second scan, no extra
    aggregation job. This replaces the reference's pattern of calling
    ``.count()`` between stages (each count = one full re-execution,
    ``playback_pipeline.py`` logs row counts this way); ``observe``
    is the Spark-native accumulator the optimizer carries through
    the existing plan for free.
    """
    from pyspark.sql import Observation

    prepared = prepare_corpus(df, id_col, text_col, salt=salt)
    obs = Observation("corpus_metrics")
    out = prepared.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    return out, obs


def select_by_token_budget(
    scored: DataFrame,
    budget: int,
    score_col: str = "q_r",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Budget-constrained corpus selection: take documents in
    priority order (score desc, id asc) until the cumulative token
    count crosses ``budget`` — "the best B tokens of data", the
    curation query that turns a scored corpus into a training set.
    A document is selected iff the tokens BEFORE it (in priority
    order) are under budget, so overshoot is bounded by one document.

    Distributed shape: the global priority cumsum is two-level, keyed
    by the SCORE VALUE itself — per-score token sums (one hash
    aggregate), an exclusive running sum over the distinct-score
    table (the only ordered pass — distinct rounded scores, orders of
    magnitude smaller than documents), then an exclusive within-score
    window ordered by id (bounded groups) plus the score offset,
    joined back by score. Same pattern as ``token_shard_packing``;
    requires a deterministic (fixed-point rounded) score so the
    priority order is total and engine-reproducible.
    """
    from pyspark.sql import Window as W

    per_score = scored.groupBy(score_col).agg(
        F.sum(tokens_col).alias("score_tokens")
    )
    w_scores = W.orderBy(F.col(score_col).desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    offsets = per_score.select(
        score_col,
        F.coalesce(F.sum("score_tokens").over(w_scores), F.lit(0)).alias(
            "score_offset"
        ),
    )
    w_in = (
        W.partitionBy(score_col)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        scored.join(F.broadcast(offsets), score_col)
        .withColumn(
            "tokens_before",
            F.col("score_offset")
            + F.coalesce(F.sum(tokens_col).over(w_in), F.lit(0)),
        )
        .where(F.col("tokens_before") < budget)
        .select(id_col, score_col, tokens_col, "tokens_before")
    )


def curriculum_buckets(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 4,
    out_col: str = "bucket",
) -> DataFrame:
    """Assign each row to a score-quantile curriculum bucket (1 =
    lowest quartile .. ``n_buckets`` = highest) — the phase labelling
    a curriculum-ordered training export keys its shards by.

    NOT an ``ntile`` window: a global ranking window single-partition-
    sorts the corpus. Instead the n-1 exact percentile thresholds
    collapse to ONE broadcast row and assignment is a pure row-local
    comparison sum — the same percentile-broadcast pattern as q32's
    scalar subquery, so the only non-linear work is the percentile
    aggregate itself (t-digest-able at 100 TB via percentile_approx;
    exact here to stay oracle-checkable). Boundary semantics: a row
    equal to a threshold stays in the LOWER bucket, matching
    ``quantile_cont`` replay in ANSI SQL."""
    ps = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
    th = df.agg(F.expr(f"percentile({score_col}, array({ps}))").alias("_th"))
    bucket = F.lit(1).cast("long")
    for j in range(n_buckets - 1):
        bucket = bucket + F.when(
            F.col(score_col) > F.element_at("_th", j + 1), F.lit(1)
        ).otherwise(F.lit(0)).cast("long")
    return (
        df.crossJoin(F.broadcast(th))
        .withColumn(out_col, bucket)
        .drop("_th")
    )


def bench_gram_table(
    bench: DataFrame, text_col: str, n: int = 4
) -> DataFrame:
    """(gram): the distinct word-``n``-gram table of a held-out
    benchmark set — the broadcast side of every decontamination join
    (tokens are ``\\S+`` runs; extraction is the anchored-lookahead
    regex, one codegen pass)."""
    pat = rf"(?:^|(?<= ))(?=((\S+ ){{{n - 1}}}\S+))"
    norm = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return (
        bench.select(norm.alias("_norm"))
        .select(
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(F.col("_norm"), F.lit(pat), 1)
                )
            ).alias("gram")
        )
        .distinct()
    )


# Document-count threshold above which export-policy plans should use
# export_gate's bounded (all-skinny) shape: below it the classic
# broadcast plan wins (the bounded plan's extra exchanges are ~20 s of
# fixed stage overhead on toy batches, measured at sf0.1), while the
# broadcasts it avoids only become a hazard when the input approaches
# executor memory (the 2.5 M-doc rung death). Shared by the streaming
# gate's per-micro-batch routing (streaming/incremental.py) and the
# batch manifest's whole-corpus routing (corpus_export_manifest, r13).
_BOUNDED_BATCH_DOCS = 100_000


def export_gate(
    df: DataFrame,
    bench_grams: DataFrame,
    id_col: str,
    text_col: str,
    stored_digests: DataFrame | None = None,
    min_tokens: int = 10,
    max_dup3_ratio: float = 0.2,
    contamination_n: int = 4,
    bounded_batch: bool = False,
) -> DataFrame:
    """The per-document EXPORT policy, shared verbatim by the batch
    manifest (``corpus_export_manifest``) and the streaming gate
    (``streaming/incremental.py::streaming_export_gate``) so the two
    can never silently diverge:

        quality (>= ``min_tokens`` tokens, repeated-3-gram ratio <=
        ``max_dup3_ratio``)  ->  exact dedup (min-id per content
        digest among survivors; plus an anti-join against
        ``stored_digests`` — column ``digest`` — when a persistent
        store is maintained across batches)  ->  benchmark
        decontamination (drop any doc sharing a word n-gram with the
        BROADCAST ``bench_grams`` table).

    Tokens are ``\\S+`` runs; both gram passes are the
    anchored-lookahead regex (the qt7 fast path: one codegen pass,
    measured ~12x over ``transform``-built grams). Returns survivors
    with all input columns plus (_norm, n_tokens, _digest) for
    downstream accounting. Scale shape: quality is a shuffle-free
    predicate on the scan; dedup is one digest aggregate + semi join
    (the only corpus payload shuffle); the stored-digest anti-join
    and the gram join never shuffle the corpus (digest store keyed,
    bench grams broadcast).

    ``bounded_batch=True`` (the STREAMING gate's shape — r12, the
    qst6 1000× fix): the whole dedup verdict runs on SKINNY
    projections — digest-keyed agg + stored-digest anti-join + an
    id-keyed semi join whose BOTH sides are id/digest-width — so
    document text never enters any exchange (a 2.5 M-doc
    micro-batch's two text-width columns shuffling by join key is
    the measured 4 g shuffle-write death, and broadcasting the
    winner-id set back is no escape — a 2.5 M-id hashed relation
    does not build in 4 g either; micro-batch plans also run
    without AQE). Contamination grams explode from the pre-dedup
    quality superset (row-local off the scan); the final anti-join
    intersects with winners, so the output is identical. In this
    mode the returned survivors carry every input column EXCEPT
    ``text_col`` (and no ``_norm``) — the accounting columns
    (n_tokens, _digest) are row-local and kept. The default (batch
    qp5) keeps the shuffle form and full-column contract."""

    def grams(n: int) -> Column:
        pat = rf"(?:^|(?<= ))(?=((\S+ ){{{n - 1}}}\S+))"
        return F.regexp_extract_all(F.col("_norm"), F.lit(pat), 1)

    norm = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    staged = df.withColumn("_norm", norm).withColumn(
        "n_tokens",
        F.size(F.array_remove(F.split(F.col("_norm"), " "), "")).cast("long"),
    )
    g3 = grams(3)
    dup3 = F.when(
        F.size(g3) > 0,
        (F.size(g3) - F.size(F.array_distinct(g3))) / F.size(g3),
    ).otherwise(F.lit(0.0))
    quality = staged.where(
        (F.col("n_tokens") >= min_tokens) & (dup3 <= F.lit(max_dup3_ratio))
    ).withColumn("_digest", F.md5(F.col(text_col)))
    if bounded_batch:
        # ALL-SKINNY verdict: every exchange in the dedup decision is
        # id/digest-width (see docstring — the fat semi-join was the
        # 1000x shuffle-write death, and a broadcast join-back of the
        # winner ids failed next: a 2.5 M-id hashed relation will not
        # build in a 4 g heap mid-batch). The text column exists only
        # in row-local pipelines: the winners table carries every
        # NON-text input column + (n_tokens, _digest) straight off
        # the scan, and contamination grams explode from the quality
        # superset BEFORE dedup (row-local) — scoring a few loser
        # docs' grams is harmless because the final anti-join
        # intersects with winners anyway, and it keeps the gram
        # stream out of any verdict join. Bounded mode therefore
        # returns survivors WITHOUT text_col/_norm.
        carry = [c for c in df.columns if c != text_col]
        skinny = quality.select(*carry, "n_tokens", "_digest")
        # ONE window pass instead of digest-agg + winner semi-join
        # (r13): the agg and the join's left side were two separate
        # consumers of the quality scan — each re-ran the full
        # per-document regex battery over the corpus (~50-90 s per
        # pass at the 5 M-doc rung). The winner verdict `id ==
        # min(id) over (partition by _digest)` selects exactly the
        # same (id, digest) winner pairs (the default plan's key —
        # test_corpus pins bounded == default survivors, including
        # the duplicate-id case) with a single skinny digest-keyed
        # exchange and no join. Measured: 5 M-doc manifest 174.5 s
        # (agg+semi) → 158.7 s (window); at the 1.25 M-doc streaming
        # batch the two shapes are within noise (66.5 vs 70.3 s), so
        # the single-consumer shape wins outright — no size tier.
        # Micro-batch plans run WITHOUT AQE, so the static exchange
        # width must bound the sort slices itself: skinny rows are
        # id/digest-width, ~30 B.
        from pyspark.sql import Window

        w_digest = Window.partitionBy("_digest")
        deduped = (
            skinny.withColumn("_win", F.min(id_col).over(w_digest))
            .where(F.col(id_col) == F.col("_win"))
            .drop("_win")
        )
        # merge hint: the static planner under-guesses batch-sized
        # scans — an auto-broadcast of a 2.5 M-row store is the
        # measured 4 g death. The anti-join key is the window's
        # own partitioning, so no extra corpus-side exchange.
        if stored_digests is not None:
            deduped = deduped.join(
                stored_digests.hint("merge"),
                deduped["_digest"] == stored_digests["digest"],
                "left_anti",
            )
        # Gram stream off the RAW normalized scan, not the quality
        # subset (r14): `quality` as gram_src made the contamination
        # consumer re-run the whole per-document battery (dup3
        # lookahead regex + token split + md5) just to re-derive a
        # filter whose only effect is dropping docs the final
        # winners-anti-join drops anyway — the 5 M-doc stageprof
        # showed the two quality consumers at 92.7 + 65.8 s. Scoring
        # the extra (low-quality) docs' grams is harmless: the
        # contaminated-id set is intersected with `deduped` winners,
        # so extra ids never reach the output (same argument the
        # docstring already makes for pre-dedup gram sourcing).
        # This consumer now pays only scan + whitespace-normalize +
        # the gram extraction itself.
        gram_src = staged
    else:
        keep = quality.groupBy("_digest").agg(F.min(id_col).alias(id_col))
        deduped = quality.join(keep, [id_col, "_digest"], "left_semi")
        if stored_digests is not None:
            deduped = deduped.join(
                stored_digests,
                deduped["_digest"] == stored_digests["digest"],
                "left_anti",
            )
        gram_src = deduped
    survivor_grams = gram_src.select(
        F.col(id_col),
        F.explode(F.array_distinct(grams(contamination_n))).alias("gram"),
    )
    # Broadcast FINGERPRINTS, verify EXACTLY (r10): the bench-gram
    # table grows with the held-out set, and broadcasting raw gram
    # STRINGS OOM'd the 1000x rung (~32 M grams ≈ GBs as a hash
    # relation in a 4 g heap). Production decontamination broadcasts a
    # compact fingerprint set instead: survivor grams prefilter
    # against xxhash64 fingerprints (8 B per bench gram; NO false
    # negatives, ~n_bench/2^64 false-candidate rate), and only the
    # surviving sliver joins the full gram table for exact string
    # verification — so the output is identical to the plain string
    # join the oracle replays, while broadcast memory is bounded and
    # the corpus-sized gram stream still never shuffles (the
    # prefilter is a broadcast join; only candidates reach the
    # exact-verify exchange).
    if bounded_batch:
        # One exact merge semi join instead of the fingerprint
        # broadcast (r12): the bench-gram fingerprint relation grows
        # with the held-out set (~12.5 M longs at the 5 M-doc rung —
        # "Not enough memory to build and broadcast" in 4 g while the
        # micro-batch pipeline holds its own working set). Bounded
        # mode's gram stream is BATCH-sized by convention, so the
        # skinny (id, gram) shuffle is disk-bounded and safe — the
        # trade is one exchange the unbounded path's broadcast
        # avoids, bought back by dropping the prefilter pass.
        contaminated = (
            survivor_grams.join(bench_grams.hint("merge"), "gram", "left_semi")
            .select(id_col)
            .distinct()
        )
    else:
        bench_fp = bench_grams.select(
            F.xxhash64("gram").alias("_gh")
        ).distinct()
        cand = (
            survivor_grams.withColumn("_gh", F.xxhash64("gram"))
            .join(F.broadcast(bench_fp), "_gh")
            .drop("_gh")
        )
        contaminated = (
            cand.join(bench_grams, "gram", "left_semi")
            .select(id_col)
            .distinct()
        )
    return deduped.join(contaminated, id_col, "left_anti")


def corpus_export_manifest(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    min_tokens: int = 10,
    max_dup3_ratio: float = 0.2,
    contamination_n: int = 4,
    chunk_tokens: int = 64,
    overlap: int = 8,
    n_docs: int | None = None,
) -> DataFrame:
    """The full training-data EXPORT gate as one composed DAG:

        quality (length + repetition)  ->  exact dedup (min-id per
        content digest)  ->  benchmark decontamination (drop any doc
        sharing a word n-gram with the held-out set)  ->  chunk
        accounting  ->  per-source manifest

    — i.e. every per-document policy this package verifies
    individually (qt6's repetition gate, qd1's digest dedup, qt7's
    contamination rule, qt9's chunk arithmetic), fused into the
    single plan an actual corpus export runs, ending in the manifest
    (docs / tokens / chunks per source) that ships with the dataset.

    Per-document policy semantics and scale shape live in
    ``export_gate`` (shared verbatim with the streaming gate so batch
    and stream can never diverge); this function adds the chunk
    accounting — row-local integer arithmetic, no explode (the
    manifest needs counts, not chunk rows) — and the final combinable
    per-source rollup. The content digest hashes the RAW text (dedup
    must not conflate whitespace variants).
    """
    # Size-route to the all-skinny gate plan above the streaming
    # gate's batch bound (r13): the manifest consumes only
    # (source, n_tokens, id) — all carried by bounded mode — and
    # bounded == default survivors is pinned by test_corpus, so the
    # only difference at scale is that document text stays out of
    # every dedup/contamination exchange. The 5 M-doc rung measured
    # the default (fat) plan at 244.7 s vs the same corpus streamed
    # through the bounded plan in ~4 batches at ~53 s each; routing
    # here removes the text-width semi-join and the corpus-sized
    # fingerprint broadcast from the one-batch DAG. The count() probe
    # is metadata-fast on the parquet scans this DAG starts from;
    # callers holding a derived/filtered corpus pass ``n_docs`` (any
    # upper bound works — it only picks the plan tier) so the
    # upstream plan is never re-executed for routing (the
    # minhash_lsh_pairs n_docs convention).
    clean = export_gate(
        corpus.select(F.col(id_col), F.col(source_col), F.col(text_col)),
        bench_gram_table(bench, text_col, contamination_n),
        id_col,
        text_col,
        min_tokens=min_tokens,
        max_dup3_ratio=max_dup3_ratio,
        contamination_n=contamination_n,
        bounded_batch=(n_docs if n_docs is not None else corpus.count())
        > _BOUNDED_BATCH_DOCS,
    )
    step = chunk_tokens - overlap
    n_chunks = F.expr(
        f"greatest(CAST(1 AS BIGINT), (n_tokens - {overlap} + {step - 1}) div {step})"
    )
    return (
        clean.withColumn("_n_chunks", n_chunks)
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("_n_chunks").cast("long").alias("total_chunks"),
            F.min(id_col).alias("min_doc"),
        )
    )
