"""Embedding similarity search over ``array<float>`` columns.

Baseline: brute-force cosine top-k (exact). Scale path: bucketed
(sign-quantized) search that prunes the candidate space before any
dot product — the IVF/LSH shape where candidate generation is an
equi-join on a coarse code.

All arithmetic is built-in higher-order functions (``zip_with`` +
``aggregate``) on doubles, JVM-side codegen: a left-to-right fold
matching ANSI-SQL ``list_dot_product`` semantics exactly, so results
are oracle-checkable bit-for-bit. A distributed block-matmul BLAS
path is the drop-in replacement where throughput demands it (see
``cosine_topk_blas``); at 64 dims the codegen fold is competitive.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Trainer loops run with AQE ON, like every other path (r15 revert of
# the r14 ``_no_aqe`` scoping). r14 scoped AQE off inside the Lloyd
# loops to save 3-5 scheduler rounds per iteration (a win on the r14
# builder box, ~0.1 s fixed latency per job) — but with AQE off every
# trainer shuffle runs at the raw ``spark.sql.shuffle.partitions``
# (= cores) instead of coalescing to the handful of tasks the
# sample-sized frames need, and the driver's r14 bench regressed the
# whole family 21-41% (qs8 0.59x, qs10 0.72x, qs7 0.74x, qs11 0.79x)
# on a box ~20% FASTER than r13's. The r15 same-box isolation A/B
# (tools/ab_r15.py, sf0.1, warmup + min-of-3, fresh session per
# variant) confirmed AQE-on wins at 32 cores and costs nothing at 8:
#   32c total: _no_aqe 25.24 s | AQE on 21.09 s | _no_aqe+parts=4 22.03 s
#     (qs7 4.05->3.07, qs8 3.28->2.29, qs10 2.97->2.50, qs11 5.63->4.00)
#   8c total:  _no_aqe 25.54 s | AQE on 25.62 s (noise-level)
# Worker-BLAS pinning (OPENBLAS_NUM_THREADS=1) was A/B'd in the same
# sweep and is SHARPLY worse (32c total 38.18 s): this numpy links
# OpenBLAS MAX_THREADS=2 and the 2-thread dgemm is a real win per
# kernel batch — rejected. Outputs are bit-identical under either AQE
# setting by the trainers' determinism contract (per-row fold dots,
# commutative struct-max argmax, quantized-integer cell sums).


def _dot(a: Column, b: Column) -> Column:
    """In-order double-precision dot product of two float arrays.

    Left-fold accumulation — bitwise-identical to an ANSI
    ``list_dot_product`` loop. NOTE: Spark's higher-order functions
    are CodegenFallback (interpreted per element), so this kernel is
    CPU-bound at ~10^5 dots/core/s; it is the *exactness* path. The
    throughput path is the BLAS kernel in ``cosine_topk_blas``.
    Callers on hot pair-joins should pre-cast vectors to
    ``array<double>`` once (see ``_double_base``) so the per-pair
    lambda does multiply-add only.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot_pre(a: Column, b: Column) -> Column:
    """Dot product over pre-cast ``array<double>`` columns (no per-pair
    casts; ~30% faster in the interpreted HOF evaluator).

    Measured dead end (r8): unrolling a d=64 dot into 64 scalar
    ``element_at(a,i)*element_at(b,i)`` terms is 9× SLOWER than this
    fold (6.4e7 pairs: 17 s fold vs 152 s unrolled, identical sums) —
    the 128-element_at expression tree falls out of whole-stage
    codegen while the HOF fold runs one tight specialized loop.
    Unrolling only wins at SMALL static term counts (the m=8 ADC sum
    in ``cosine_topk_ivfpq``: 2.5 s unrolled vs 5.6–7.5 s zip_with on
    the same pair count). Keep d-dimensional dots on this fold; the
    throughput path remains the BLAS kernel."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _double_base(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, v: array<double>, norm) — cast + norm computed once per
    vector, before any pair join multiplies the row count.

    The scan is REPARTITIONED to full cluster width first (r8): the
    embeddings parquet splits into few, large input partitions
    (13 × ~9 MB at the 100× ladder point under 128 MB
    maxPartitionBytes), and every downstream interpreted-fold
    pipeline — assignment scoring, encode, pair scoring — FUSES into
    that stage, capping the engine's hottest CPU work at the scan's
    split count (measured: the dominant qs19 stage ran 727 s on 13
    of 32 cores). One linear n-row exchange here buys full-width
    parallelism for every fold stage above it; the explicit
    partition NUMBER keeps AQE from coalescing the exchange back
    down (vector bytes per partition are small — the cost downstream
    is CPU per row, which AQE's size heuristic cannot see)."""
    n_part = df.sparkSession.sparkContext.defaultParallelism
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        df.repartition(n_part)
        .select(F.col(id_col).alias("id"), vd.alias("v"))
        .withColumn("norm", F.sqrt(_dot_pre(F.col("v"), F.col("v"))))
    )


# Target ON-SCAN bytes per packed BLAS block (r15, VERDICT r14 #3).
# One block is ONE ``collect_list`` row, so block bytes must stay
# task-sized as the collection grows — a cores-derived block COUNT
# makes block SIZE grow linearly with n (unbounded at 100 TB). The
# kernel widens float32->float64 (2x), holds two blocks per combo
# plus the (rows_q x rows_d) float64 score matrix; 32 MB on-scan
# keeps the per-task transients in the low hundreds of MB.
_BLAS_BLOCK_BYTES = 32 << 20


def _scan_bytes_est(df: DataFrame) -> int | None:
    """Optimizer-estimated input bytes for BLAS block sizing, ONLY
    when the plan is projections/filters over leaf relations (the
    ``_sizing_count`` guard reused): there the estimate is backed by
    real file sizes, while derived plans (joins, aggregates,
    generates) carry estimates wrong by orders of magnitude in either
    direction — and a wrong block count costs B^2 useless combos or
    an OOM-sized block. Returns None for derived frames; callers fall
    back to the cores floor (and can pass the block count
    explicitly). No job runs: statistics come from the file index."""
    import re

    from spotify_pipeline_gcp_spark.operators.dedup import _SCAN_CHEAP_NODES

    plan = df._jdf.queryExecution().optimizedPlan()
    nodes = {
        m.group(1)
        for m in re.finditer(
            r"^[\s:+\-]*'?([A-Za-z][A-Za-z0-9]*)", plan.treeString(), re.M
        )
    }
    if nodes - _SCAN_CHEAP_NODES:
        return None
    return int(plan.stats().sizeInBytes())


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach the L2 norm of the embedding column."""
    v = F.col(vec_col)
    return df.withColumn("norm", F.sqrt(_dot(v, v)))


def cosine_pairs(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """All-pairs cosine similarity (doc_a < doc_b) — the exact kernel.

    O(n²) by construction; used directly only on bounded sets (a
    candidate pool, one LSH bucket). ``cosine_topk`` / bucketed
    variants bound n before this kernel runs.
    """
    base = _double_base(df, id_col, vec_col)
    a, b = base.alias("a"), base.alias("b")
    cos = _dot_pre(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    return a.join(b, F.col("a.id") < F.col("b.id")).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        cos.alias("cosine"),
    )


def cosine_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k nearest neighbors per vector by cosine.

    Brute force: n² dot products, then a ranking window partitioned
    by the query id. Correctness baseline for the bucketed variant.
    At scale, broadcast one side in blocks (the classic block-matmul
    layout) or switch to ``cosine_topk_bucketed``.
    """
    from pyspark.sql import Window as W

    base = _double_base(df, id_col, vec_col)
    a, b = base.alias("a"), base.alias("b")
    cos = _dot_pre(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    pairs = a.join(b, F.col("a.id") != F.col("b.id")).select(
        F.col("a.id").alias("query_id"),
        F.col("b.id").alias("neighbor_id"),
        cos.alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def index_size_for(n_vectors: int, target_cell: int = 256) -> int:
    """Cells (buckets or k-means clusters) an ANN index needs so the
    average cell holds ~``target_cell`` vectors. THE scale knob for
    every fixed-partition ANN shape here: within-cell candidate pairs
    grow as n²/cells, so cells must grow WITH the corpus or the
    self-join quietly goes quadratic — measured at the 10x scale
    bench (SCALE_BENCH_r05: qs3 with its 16 buckets pinned for the
    oracle went x77 on x10 data; the same query auto-sized stays
    ~linear). Rule of thumb: cells = n / target_cell, target sized so
    one cell's vectors fit a task's memory (256 x 64 doubles ≈ 128 KB
    — far below any executor budget; at 100 TB keep cells ≲ a few
    thousand rows and let AQE split stragglers)."""
    return max(1, n_vectors // max(1, target_cell))


def sign_bits_for(n_vectors: int, target_bucket: int = 256) -> int:
    """Sign-bucket bit count so the average bucket holds
    ~``target_bucket`` vectors (see ``index_size_for``), clamped to
    32 bits — ``1 << j`` must stay far from the BIGINT sign on both
    engines, and compat.SIZED_BITS_SQL bakes the same ``least(32,…)``
    into every oracle replay. The clamp lives HERE (not at call
    sites) so the Python sizing and the SQL replay cannot disagree:
    a pre-r10 caller that forgot its own ``min(32, …)`` would have
    silently drifted from the oracle at very large n."""
    return min(
        32, max(1, math.ceil(math.log2(index_size_for(n_vectors, target_bucket))))
    )


# Hot-bucket cap for every SIGN-BUCKET self-join: buckets holding more
# than this many vectors are DROPPED from candidate generation — the
# embedding-side analogue of qd3b's ``max_shingle_df`` posting cap and
# qd9b's ``max_bucket`` band cap. ``sign_bits_for`` right-sizes the
# AVERAGE bucket (~256) but sign bits are data-correlated, not hashed:
# a dense region keeps one bucket at a constant fraction of n no
# matter how many bits are added (r9's 1000x rung measured a 3,264-row
# max bucket at 13 bits — and sub-splitting to all 64 sign bits still
# left ~1,000-row sign-TIED groups), and one such bucket contributes
# size²/2 candidate pairs ON ONE REDUCER. The cap bounds worst-case
# candidate volume at cap·n/2 — linear by construction — at the
# standard LSH recall trade: pairs inside a dropped mega-bucket are
# not scored (boilerplate-dominated regions where near-dup signal is
# weakest). 4096 = 16x the target bucket: it binds ONLY on
# pathological skew, never at driver scale (sf0.01/sf0.1 corpora are
# ≤ 2,000 vectors total, so oracle-checked outputs are unchanged),
# and every oracle replays it via compat.SIZED_BUCKET_CAP_SQL.
MAX_SIGN_BUCKET = 4096


def drop_hot_buckets(
    base: DataFrame, max_bucket: int = MAX_SIGN_BUCKET, bucket_col: str = "bucket"
) -> DataFrame:
    """Remove rows in over-cap buckets before a bucketed self-join.

    One combinable groupBy (partial map-side agg → ~n_buckets rows)
    finds the hot bucket ids; the anti-join back is broadcast (the
    hot set is tiny by construction — at most n/cap ids). Cost: one
    extra scan of the (id, bucket) projection; payoff: the self-join
    is worst-case linear instead of worst-case quadratic."""
    hot = (
        base.groupBy(bucket_col)
        .count()
        .where(F.col("count") > max_bucket)
        .select(bucket_col)
    )
    return base.join(F.broadcast(hot), bucket_col, "left_anti")


def trained_cells_for(n_vectors: int) -> int:
    """Cell count for a TRAINED quantizer: k = floor(sqrt(n)) — the
    classic IVF balance. ``index_size_for``'s cells = n/target is
    right only when partitioning is free (sign buckets): it keeps
    search linear (n·target candidates) but a TRAINER that scores
    every vector against every centroid then costs n·k = n²/target —
    quadratic. k = √n balances trainer (n^1.5) against within-cell
    search (n²/k = n^1.5), the standard FAISS/IVF sizing. Computed
    as floor of the IEEE double sqrt so an SQL oracle running
    ``floor(sqrt(count(*)))`` reproduces it bit-for-bit."""
    return max(1, math.floor(math.sqrt(n_vectors)))


def imi_cells_for(n_vectors: int) -> int:
    """PER-QUANTIZER cell count for a two-level inverted MULTI-index
    (IMI, Babenko & Lempitsky 2012), sized for LINEAR search:
    k_each = ceil(sqrt(n/256)), so the PRODUCT grid has k_each² ≈
    n/256 cells and the average cell holds ~256 vectors — the same
    per-cell budget ``sign_bits_for`` gives the hash buckets. This is
    what makes the IMI the TRAINED index for the all-corpus self-join
    at scale: within-cell candidates stay ~256·n (linear, like qs13),
    while the product decomposition cuts quantizer cost to
    2·k_each = 2·√(n/256) scorings per vector — n^1.5/8 total, still
    Θ(n^1.5) asymptotically but with a 1/16 constant vs the
    single-level alternatives: a flat quantizer with n/256 cells
    would pay n²/256 in assignment, and the classic √n-cell IVF
    (``trained_cells_for``, qs14/qs16) pays n·√n in SEARCH on a
    self-join. (The retired k_each = n^(1/4) sizing was the shape
    whose assignment was O(n^1.25); the search-sized grid trades
    that back for linear search, which dominates on the self-join.) (Before r7 this
    returned n^(1/4): a √n-cell grid matching qs14's search cost; the
    search-sized grid replaces it because the self-join is exactly
    where an n^1.5 SEARCH term hurts.) Computed as ceil of the IEEE double sqrt
    of n/256.0 (an exact power-of-two division) so an SQL oracle
    running ``ceil(sqrt(count(*) / 256.0))`` reproduces it
    bit-for-bit. Clamped ≥2: a 1×1 grid is no index."""
    return max(2, math.ceil(math.sqrt(n_vectors / 256.0)))


def sign_bucket(vec_col: str, n_bits: int = 4) -> Column:
    """Coarse quantization code: sign bits of the first ``n_bits``
    components. A deterministic stand-in for trained IVF centroids —
    the partitioning shape is identical (code = cluster id).

    ``n_bits`` is a SCALE knob, not a constant: fix it and the
    within-bucket self-join grows n²/2^bits — size it with
    ``sign_bits_for`` (registered queries pin small values only so
    their oracles replay byte-identically at every sf)."""
    code = F.lit(0)
    for j in range(n_bits):
        code = code + F.when(
            F.element_at(F.col(vec_col), j + 1).cast("double") > 0.0,
            F.lit(2**j),
        ).otherwise(F.lit(0))
    return code.cast("long")


def cosine_topk_bucketed(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the same sign-bucket.

    The scale path: bucketing turns the n² join into per-bucket
    blocks (equi-join on the code), cutting candidate volume by
    ~2^n_bits for balanced buckets. Recall loss is the standard ANN
    trade; probe more buckets (multi-probe) to recover it. With
    trained coarse centroids this is exactly IVF-flat.
    """
    from pyspark.sql import Window as W

    base = _double_base(df, id_col, vec_col).withColumn(
        "bucket", sign_bucket("v", n_bits)
    )
    a, b = base.alias("a"), base.alias("b")
    cos = _dot_pre(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.id") != F.col("b.id")),
    ).select(
        F.col("a.bucket").alias("bucket"),
        F.col("a.id").alias("query_id"),
        F.col("b.id").alias("neighbor_id"),
        cos.alias("cosine"),
    )
    # cell-local top-k (the qs19 r8 rewrite's trick): a query's
    # candidates all live in its own bucket, so ranking within
    # (bucket, query_id) equals the global per-query rank — and the
    # equi-join's hash-partitioning on bucket already satisfies the
    # window's clustering, so the FULL pair stream is never
    # re-exchanged on query_id; WindowGroupLimit prunes to k during
    # the local sort. At the 100× ladder point that exchange is the
    # entire candidate set (~256·n rows) — this removes it.
    w = W.partitionBy("bucket", "query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk_multiprobe(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 4,
) -> DataFrame:
    """Multi-probe bucketed top-k: each query probes its own sign
    bucket AND every bucket at Hamming distance 1 (one sign bit
    flipped). Vectors near a quantization boundary sit in a
    neighboring cell; probing adjacent cells recovers most of the
    recall single-probe (qs3) loses, at (n_bits+1)× candidate cost —
    still ~2^n_bits/(n_bits+1) cheaper than brute force. This is the
    standard multi-probe LSH refinement; with trained centroids it is
    IVF nprobe>1. Probes are generated by exploding XOR-flipped
    codes, so candidate generation stays a pure equi-join on the
    probe code — same shuffle shape as qs3, just a wider build side.
    """
    from pyspark.sql import Window as W

    base = _double_base(df, id_col, vec_col).withColumn(
        "bucket", sign_bucket("v", n_bits)
    )
    probe_codes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_bits)],
    )
    probes = base.select(
        F.col("id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.explode(probe_codes).alias("probe"),
    )
    b = base.alias("b")
    cos = _dot_pre(F.col("qv"), F.col("b.v")) / (F.col("qnorm") * F.col("b.norm"))
    pairs = probes.join(
        b,
        (F.col("probe") == F.col("b.bucket"))
        & (F.col("query_id") != F.col("b.id")),
    ).select(
        "query_id", F.col("b.id").alias("neighbor_id"), cos.alias("cosine")
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return pairs.withColumn("rank", F.row_number().over(w).cast("long")).where(
        F.col("rank") <= k
    )


def cosine_topk_blas(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
    quant: bool = False,
    raw: bool = True,
) -> DataFrame:
    """Exact brute-force top-k with a distributed block-matmul BLAS
    kernel — no driver collect, no whole-collection broadcast.

    Layout: the collection is hashed into ``n_blocks`` packed rows
    (one ``collect_list`` of (id, vector) per block), the packed
    table is cross-joined with itself (B² combo rows), and an Arrow-
    batched NumPy kernel computes each block×block slab as one matrix
    multiply, emitting a per-(query, block) partial top-k. A final
    ranking window merges partials into the global top-k — correct
    because every global neighbor is in some block's partial top-k.

    Scale accounting: shuffled bytes = 2·B·|collection| (each block
    participates in B combos); per-task memory = 2 blocks ≈
    2·n·d·8/B bytes. The default B (r15) is sized from DATA VOLUME —
    ``max(√(2·cores) floor, scan_bytes / _BLAS_BLOCK_BYTES)`` — so B
    grows linearly with the collection, blocks stay ~task-sized, and
    the driver never touches vector data: the standard parallel
    dense GEMM decomposition. Block count changes no output row
    (every pair meets in exactly one combo; the rank merge is
    global), so the sizing is a pure execution knob. Compose with ``sign_bucket`` (qs3) when
    n² slabs are no longer affordable at all and approximate recall
    is acceptable.

    Tie-break matches ``cosine_topk``: (cosine desc, neighbor_id).
    Scoring has two modes:

    - ``quant=False`` (default): raw float64 dgemm over NumPy-
      normalized rows. BLAS accumulation order differs from a
      sequential fold at ulp level, so this mode is rows-only (no
      SQL oracle); ``cosine_topk`` is the exact-fold twin.
    - ``quant=True``: QUANTIZED-EXACT scoring — unit vectors come
      from the JVM fold (``_unit_vectors``, bit-identical to the SQL
      replay), are rounded at ``_ASSIGN_QSCALE`` inside the kernel,
      and the dgemm computes integer dots that are exact in float64
      under ANY accumulation order (d=64 dot ≤ 2^46 < 2^53). The
      emitted ``cosine`` is the fixed-point value qdot / 2^40 — a
      dyadic rational both engines represent exactly — so the query
      is HASH-VERIFIABLE by a DuckDB oracle replaying the same
      quantized dots (the qs19b build discipline applied to search).

    ``raw=True`` (default): the packed blocks carry the RAW float32
    embeddings — half the shuffle/Arrow bytes of the float64 forms —
    and the kernel widens (exact) and, for ``quant``, replays the
    unit-normalize fold bit-exactly (see ``_blas_topk_from_combos``);
    emitted values are bit-identical to the ``raw=False`` JVM-side
    cast/normalize paths, pinned by pytest.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window as W

    if n_blocks is None:
        # B² combos saturate the cluster already at B ≈ √(2·cores);
        # replication cost (2·B·|collection|) and per-combo unpack
        # overhead both grow linearly in B, so the FLOOR is the
        # smallest B that keeps every core busy. The DATA term (r15):
        # B ≥ scan_bytes / _BLAS_BLOCK_BYTES keeps one block (= one
        # collect_list row) ~task-sized as n grows — the docstring's
        # n·d·8/128MB accounting, now computed from the optimizer's
        # file-backed stats instead of left to the caller. max() of
        # the two: small collections keep every core busy, large
        # collections keep blocks bounded. Derived frames (no stats)
        # keep the cores floor — pass ``n_blocks`` explicitly there.
        cores = df.sparkSession.sparkContext.defaultParallelism
        est = _scan_bytes_est(df)
        n_blocks = max(
            4,
            math.ceil(math.sqrt(2 * cores)),
            math.ceil(est / _BLAS_BLOCK_BYTES) if est else 0,
        )
    if raw:
        base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    elif quant:
        base = _unit_vectors(df, id_col, vec_col).select(
            "id", F.col("u").alias("v")
        )
    else:
        base = df.select(
            F.col(id_col).alias("id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        )
    packed = (
        base.withColumn("blk", F.pmod(F.xxhash64("id"), F.lit(n_blocks)))
        .groupBy("blk")
        .agg(F.collect_list(F.struct("id", "v")).alias("items"))
    )
    combos = packed.select(
        F.col("items").alias("q_items")
    ).crossJoin(packed.select(F.col("items").alias("d_items")))
    return _blas_topk_from_combos(combos, k, quant=quant, raw=raw)


def _blas_topk_from_combos(
    combos: DataFrame, k: int, quant: bool = False, raw: bool = False
) -> DataFrame:
    """Shared BLAS tail: score each (q_items, d_items) block pair with one
    NumPy matmul emitting per-(query, block) partial top-k, then merge
    partials with a ranking window — correct because every global
    neighbor appears in some block's partial top-k.

    ``quant=False``: rows are raw vectors, normalized HERE (NumPy
    pairwise-summed norm — float throughput mode, rows-only).
    ``quant=True``: rows are unit vectors; the kernel rounds at
    ``_ASSIGN_QSCALE`` and divides the exact integer dot by QSCALE² —
    every emitted value is bit-exact against the SQL replay (see
    ``cosine_topk_blas``). With ``raw=False`` the unit vectors come
    pre-normalized from the JVM fold (float64 across the shuffle and
    Arrow); with ``raw=True`` the rows are the RAW float32 embeddings
    and the kernel replays ``_unit_vectors``'s chain itself bit-exactly
    (exact float→double widening, sequential-fold norm, ``sqrt``, one
    exact division per element — the ``assign_clusters_quant_blas``
    raw-path argument), which halves the packed blocks' shuffle and
    Arrow bytes and removes the JVM HOF normalize entirely."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window as W

    qscale = float(_ASSIGN_QSCALE)

    def _unpack(items):
        ids = np.fromiter((r["id"] for r in items), dtype="int64", count=len(items))
        mat = np.stack([np.asarray(r["v"], dtype="float64") for r in items])
        if quant:
            if raw:
                # _unit_vectors' bits: sequential fold norm, then one
                # exact division per element
                p = mat * mat
                acc = p[:, 0] + 0.0
                for i in range(1, p.shape[1]):
                    acc = acc + p[:, i]
                mat = mat / np.sqrt(acc)[:, None]
            return ids, np.floor(mat * qscale + 0.5)
        return ids, mat / np.linalg.norm(mat, axis=1, keepdims=True)

    def kernel(batches):
        for pdf in batches:
            rows: list[tuple[int, int, float]] = []
            for q_items, d_items in zip(pdf["q_items"], pdf["d_items"]):
                q_ids, qm = _unpack(q_items)
                d_ids, dm = _unpack(d_items)
                sims = qm @ dm.T
                sims[q_ids[:, None] == d_ids[None, :]] = -np.inf
                kk = min(k, sims.shape[1])
                for r in range(sims.shape[0]):
                    s = sims[r]
                    if kk < s.shape[0]:
                        top = np.argpartition(-s, kk - 1)[:kk]
                        # TIE-AWARE boundary (r12): argpartition picks
                        # by score alone, but the contract tie-break is
                        # (score desc, neighbor_id) — at an exact score
                        # tie on the k-boundary it may keep a higher id
                        # and drop the lower one. Rare for raw floats;
                        # COMMON for quantized integer scores (exact-
                        # duplicate vectors collide exactly). Widen the
                        # selection to every boundary-score column,
                        # then let the lexsort cut the true top-k.
                        thresh = s[top].min()
                        if np.isfinite(thresh):
                            top = np.concatenate(
                                (top[s[top] > thresh],
                                 np.nonzero(s == thresh)[0])
                            )
                    else:
                        top = np.arange(s.shape[0])
                    top = top[np.lexsort((d_ids[top], -s[top]))][:kk]
                    for j in top:
                        if np.isfinite(s[j]):
                            # quant: qdot / 2^40 — exact (power-of-two
                            # scaling of an integer-valued float64)
                            val = s[j] / (qscale * qscale) if quant else s[j]
                            rows.append((int(q_ids[r]), int(d_ids[j]), float(val)))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"])

    partials = combos.mapInPandas(
        kernel, schema="query_id long, neighbor_id long, cosine double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return partials.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).where(F.col("rank") <= k)


def cosine_topk_bucketed_blas(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 4,
    n_sub: int | None = None,
    quant: bool = False,
    max_bucket: int | None = None,
    raw: bool = True,
) -> DataFrame:
    """IVF-with-BLAS: the production ANN shape. Candidate pruning from
    ``cosine_topk_bucketed`` (sign-bucket code ≈ IVF cluster id) +
    the Arrow/NumPy matmul kernel from ``cosine_topk_blas`` — each
    bucket packs into one block row and scores against ITSELF, so
    candidate generation needs no join at all (the bucket IS the
    block) and total FLOPs drop ~2^n_bits vs brute force while each
    FLOP runs at BLAS speed instead of the interpreted fold.

    ``n_sub`` sub-splits each bucket by id-hash into n_sub² block
    pairs for when one cluster outgrows a task (skewed clusters are
    exactly the salting problem — n_sub is the salt). Default (None):
    derived from data volume (r15) — the EXPECTED bucket carries
    ``scan_bytes / 2^n_bits``, so ``n_sub = ceil(that /
    _BLAS_BLOCK_BYTES)`` keeps the average block task-sized at any
    corpus size (1 for small inputs — the old default — growing with
    n). Sub-splitting changes NO output row (every (query, neighbor)
    pair still meets in exactly the q-sub × d-sub combo of their
    shared bucket, and the rank window is global). Outlier buckets far
    above the expectation are ``max_bucket``'s job, not n_sub's.
    Recall == single-probe bucketing (qs3) by construction; compose
    with the multi-probe trick (qs5) for boundary recall.

    ``quant=False``: raw float64 dgemm — accumulation order differs
    from the SQL fold at ulp level, rows-only; the fold twin (qs3)
    is the oracle-checked exactness baseline. ``quant=True``:
    quantized-exact scoring over unit vectors, hash-verifiable; see
    ``cosine_topk_blas``.

    ``raw=True`` (default): sign buckets are computed on the RAW
    embedding (identical codes — sign(u_i) == sign(v_i), and the
    oracles already replay raw-sign buckets), packed blocks carry
    float32 (half the shuffle/Arrow bytes) and the kernel widens +
    normalizes bit-exactly in NumPy; ``raw=False`` keeps the JVM-side
    cast/normalize paths (pinned bit-equal by pytest).
    """
    if raw:
        base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    elif quant:
        base = _unit_vectors(df, id_col, vec_col).select(
            "id", F.col("u").alias("v")
        )
    else:
        base = df.select(
            F.col(id_col).alias("id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        )
    base = base.withColumn("bucket", sign_bucket("v", n_bits))
    if max_bucket is not None:
        # the sized shape's hot-bucket cap (qs13's r10 move): a dense
        # region's bucket is dropped BEFORE packing, which bounds both
        # the candidate volume (cap·n) and the per-task score matrix
        # (≤ cap² × 8 B transient) — without it one mega-bucket block
        # is a quadratic dgemm on one task
        base = drop_hot_buckets(base, max_bucket)
    if n_sub is None:
        est = _scan_bytes_est(df)
        n_sub = (
            max(1, math.ceil(est / (1 << n_bits) / _BLAS_BLOCK_BYTES))
            if est
            else 1
        )
    if n_sub > 1:
        base = base.withColumn("sub", F.pmod(F.xxhash64("id"), F.lit(n_sub)))
        packed = base.groupBy("bucket", "sub").agg(
            F.collect_list(F.struct("id", "v")).alias("items")
        )
        combos = (
            packed.alias("a")
            .join(packed.alias("b"), F.col("a.bucket") == F.col("b.bucket"))
            .select(
                F.col("a.items").alias("q_items"),
                F.col("b.items").alias("d_items"),
            )
        )
    else:
        packed = base.groupBy("bucket").agg(
            F.collect_list(F.struct("id", "v")).alias("items")
        )
        combos = packed.select(
            F.col("items").alias("q_items"), F.col("items").alias("d_items")
        )
    return _blas_topk_from_combos(combos, k, quant=quant, raw=raw)


def sign_bucket_pairs_blas(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int | None = None,
    n_docs: int | None = None,
    raw: bool = True,
) -> DataFrame:
    """Near-dup PAIRS (id_a < id_b, cosine_q >= threshold) with one
    integer dgemm per sign bucket — the throughput twin of the
    fold-scored bucketed pair self-join (qd7b's shape).

    Same candidate space as the self-join: auto-sized sign buckets
    (``sign_bits_for`` — avg ~256 members at any scale), hot buckets
    dropped (``MAX_SIGN_BUCKET`` — worst-case candidates linear). But
    instead of an equi-join that re-materializes both sides and
    scores each pair with an interpreted HOF fold (measured 177 s of
    qd7b's 199 s at the 5 M-doc rung), each bucket packs into ONE row
    (``collect_list`` — bounded by the cap, ≤4096×d doubles) and an
    Arrow-batched NumPy kernel scores the whole bucket against itself
    as a single matmul: candidate generation needs no join at all —
    the bucket IS the block — and every FLOP runs at BLAS speed.

    Scoring is QUANTIZED-EXACT (the qs4/qs26 discipline, see
    ``cosine_topk_blas``): with ``raw=True`` (default) the packed
    buckets carry the RAW float32 embeddings — sign buckets are
    computed on the raw vector (identical codes: sign(u_i) ==
    sign(v_i), and the oracle replays raw-sign buckets) and the
    kernel replays ``_unit_vectors``'s chain bit-exactly (exact
    widening, sequential-fold norm, sqrt, one exact division per
    element) before quantizing, so the JVM never materializes unit
    vectors (two transient array<double> per row) and the packing
    shuffle + Arrow boundary carry HALF the bytes. ``raw=False``
    keeps the JVM-fold unit-vector path (pinned bit-equal by
    pytest). Either way the kernel rounds at ``_ASSIGN_QSCALE`` and
    the dgemm's integer dots are exact in float64 under any
    accumulation order (d=64 dot ≤ 2^46 < 2^53). Emitted
    ``cosine_q`` = qdot / 2^40 — a dyadic rational both engines
    represent exactly — so the threshold cut and every value are
    hash-verifiable by a DuckDB oracle replaying the same quantized
    dots. The 2^-20 quantization moves only pairs within ~1e-6 of
    the threshold, identically in every engine; the fold twin (qd7b)
    remains the raw-float exactness anchor.

    Per-task memory: one bucket's score matrix ≤ cap² × 8 B
    (134 MB transient at the 4096 cap, freed per bucket; typical
    buckets are ~256 → ~0.5 MB). At 100 TB the packed-bucket table
    is n/256 rows of ~128 KB — the same accounting as the IVF-BLAS
    search kernels.
    """
    import numpy as np
    import pandas as pd

    if n_bits is None:
        n_bits = sign_bits_for(df.count() if n_docs is None else n_docs)
    if raw:
        base = df.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("u")
        ).withColumn("bucket", sign_bucket("u", n_bits))
    else:
        base = _unit_vectors(df, id_col, vec_col).withColumn(
            "bucket", sign_bucket("u", n_bits)
        )
    base = drop_hot_buckets(base)
    packed = base.groupBy("bucket").agg(
        F.collect_list(F.struct("id", "u")).alias("items")
    )
    qscale = float(_ASSIGN_QSCALE)

    def kernel(batches):
        for pdf in batches:
            rows: list[tuple[int, int, float]] = []
            for items in pdf["items"]:
                m = len(items)
                if m < 2:
                    continue
                ids = np.fromiter(
                    (r["id"] for r in items), dtype="int64", count=m
                )
                mat = np.stack(
                    [np.asarray(r["u"], dtype="float64") for r in items]
                )
                if raw:
                    # _unit_vectors' bits: sequential fold norm, then
                    # one exact division per element
                    p = mat * mat
                    acc = p[:, 0] + 0.0
                    for i in range(1, p.shape[1]):
                        acc = acc + p[:, i]
                    mat = mat / np.sqrt(acc)[:, None]
                qm = np.floor(mat * qscale + 0.5)
                sims = (qm @ qm.T) / (qscale * qscale)
                iu, ju = np.triu_indices(m, k=1)
                keep = sims[iu, ju] >= threshold
                ia, ib = ids[iu[keep]], ids[ju[keep]]
                # bucket member order is collect_list order, not id
                # order — normalize each pair to (min, max) by VALUE
                lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
                vals = sims[iu[keep], ju[keep]]
                rows.extend(
                    (int(a), int(b), float(s))
                    for a, b, s in zip(lo, hi, vals)
                )
            yield pd.DataFrame(
                rows, columns=["id_a", "id_b", "cosine_q"]
            )

    return packed.mapInPandas(
        kernel, schema="id_a long, id_b long, cosine_q double"
    )


# Backwards-compatible name; the driver-collect implementation it
# once pointed to is gone (it was a driver-memory cliff).
cosine_topk_pandas = cosine_topk_blas


# Fixed-point scale for deterministic distributed mean aggregation:
# quantizing each component to round(val * 1e9) makes the per-cell sum
# an INTEGER sum, which commutes exactly — the aggregate is map-side
# combinable and partition-order-independent, unlike a float sum whose
# result shifts at ulp level with partial-aggregation order. |val| <= 1
# (unit vectors), so a BIGINT sum holds ~9.2e9 members per cell before
# overflow; the 5e-10 quantization error on the mean is far below the
# 1e-6 fixed-point rounding every oracle output applies.
_QSCALE = 10**9


def _cell_means(
    assigned: DataFrame, group_col: str | list[str] = "cid"
) -> DataFrame:
    """(group_col, mv: array<double>, n): per-cell mean vectors via a
    fully distributed positional aggregate.

    Shape: ``posexplode(u)`` → ``groupBy(group, pos)`` quantized-long
    sums (map-side combinable — the shuffle carries k·d·partitions
    partial rows, never member vectors) → per-group re-assembly of the
    d means ordered by position. No row ever holds more than d scalars,
    so a cell with 10^9 members costs the same per-row memory as one
    with 10 — this replaces the previous ``sort_array(collect_list(u))``
    row-local fold, which packed every member vector of a cell into ONE
    aggregation row (n/k × d doubles: an OOM at 100× scale).

    Determinism/oracle parity: both engines compute
    ``sum(floor(val*1e9 + 0.5)::BIGINT)`` — identical IEEE multiply/
    add/floor per element, then exact integer addition in any order —
    so the means are bitwise-reproducible and replayable in ANSI SQL
    (DuckDB: positional unnest + BIGINT sums + ``list(... ORDER BY
    pos)``).
    """
    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    expl = assigned.select(*gcols, F.posexplode("u").alias("pos", "val"))
    qsums = expl.groupBy(*gcols, "pos").agg(
        F.sum(
            F.floor(F.col("val") * F.lit(float(_QSCALE)) + F.lit(0.5))
        ).alias("qsum"),
        F.count(F.lit(1)).alias("n"),
    )
    mean = F.col("qsum").cast("double") / (F.lit(float(_QSCALE)) * F.col("n"))
    return (
        qsums.withColumn("mean", mean)
        .groupBy(*gcols)
        .agg(
            # d scalar structs per group — O(d) row width, sorted by the
            # unique pos so assembly order is deterministic
            F.array_sort(F.collect_list(F.struct("pos", "mean"))).alias("pm"),
            F.max("n").alias("n"),
        )
        .select(
            *gcols,
            F.transform("pm", lambda s: s["mean"]).alias("mv"),
            "n",
        )
    )


def label_centroids_wide(
    df: DataFrame, group_col: str, vec_col: str, dim: int
) -> DataFrame:
    """(group_col, mv: array<double>, n): per-group mean of the
    group's UNIT vectors — ``_cell_means``' quantized positional
    aggregate fused into ONE wide groupBy for a statically known
    dimension (the embedding dim is part of the data contract, so
    ``dim`` sibling sum columns are available at plan time — the same
    wide-aggregation trick ``simhash`` uses for its per-bit sums).

    vs the posexplode shape: normalization happens inline per element
    (``v[j]/norm`` — no second scan building a unit-vector array),
    there is no d× row fan-out, and the single map-side-combinable
    aggregation shuffles one ``d+1``-scalar row per (partition,
    group) instead of d rows — one exchange instead of two. Row width
    is bounded by d (model property, never data volume), so the shape
    holds at any corpus scale; for very large or runtime-variable d,
    ``_cell_means``' positional shape is the generic fallback.

    Quantization is identical to ``_cell_means`` (per-element
    ``floor((v[j]/norm)*1e9 + 0.5)`` then exact BIGINT sums), so the
    result is bitwise-reproducible and replays in ANSI SQL unchanged.
    """
    base = _double_base(df, group_col, vec_col)
    qsums = [
        F.sum(
            F.floor(
                (F.element_at("v", j + 1) / F.col("norm"))
                * F.lit(float(_QSCALE))
                + F.lit(0.5)
            )
        ).alias(f"q{j}")
        for j in range(dim)
    ]
    agg = base.groupBy("id").agg(F.count(F.lit(1)).alias("n"), *qsums)
    mv = F.array(
        *[
            F.col(f"q{j}").cast("double") / (F.lit(float(_QSCALE)) * F.col("n"))
            for j in range(dim)
        ]
    )
    return agg.select(
        F.col("id").alias(group_col), mv.alias("mv"), "n"
    )


def quantize_int8(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Symmetric per-vector int8 quantization audit: (id, scale_r,
    max_abs_err_r, mean_abs_err_r) — the storage/compute compression
    step every large vector corpus applies (4x smaller than float32,
    SIMD-friendly dot products), emitted with its reconstruction
    error so the recall cost is measured, not assumed.

    scale = max|v|/127 (zero vectors keep scale 1 to avoid 0/0);
    codes are ``floor(x/scale + 0.5)`` — explicit half-up, the
    engine-portable rounding this repo standardizes on — and errors
    are recomputed per element as ``|x - code*scale|``. Everything is
    a row-local array expression: no shuffle, no UDF; the mean error
    folds left-to-right so both engines accumulate identically."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("id"), v.alias("v"))
    max_abs = F.array_max(F.transform(F.col("v"), F.abs))
    scale = F.when(max_abs > 0, max_abs / F.lit(127.0)).otherwise(F.lit(1.0))
    base = base.withColumn("scale", scale)
    err = F.transform(
        F.col("v"),
        lambda x: F.abs(
            x - F.floor(x / F.col("scale") + F.lit(0.5)) * F.col("scale")
        ),
    )
    base = base.withColumn("err", err)
    mean_err = F.aggregate(
        F.col("err"), F.lit(0.0), lambda acc, e: acc + e
    ) / F.size(F.col("err"))
    return base.select(
        "id",
        F.col("scale").alias("scale_raw"),
        F.array_max("err").alias("max_abs_err_raw"),
        mean_err.alias("mean_abs_err_raw"),
    )


def _seeded_init(pts: DataFrame, k: int) -> DataFrame:
    """(cid, c): the k vectors ranked first by ``md5(id)`` — a seeded
    pseudo-random draw both engines compute identically. The global
    rank is taken with ``orderBy(...).limit(k)`` (TakeOrdered: per-
    partition top-k, then a k-row merge), NOT a row_number window over
    the full table — the window form single-partition-sorts all n rows.
    The residual window here orders only the k survivors."""
    from pyspark.sql import Window as W

    top = (
        pts.select("id", "u", F.md5(F.col("id").cast("string")).alias("ik"))
        .orderBy("ik", "id")
        .limit(k)
    )
    return (
        top.withColumn("rn", F.row_number().over(W.orderBy("ik", "id")))
        .select((F.col("rn") - 1).cast("long").alias("cid"), F.col("u").alias("c"))
    )


def _argmax_assign(pts: DataFrame, centroids: DataFrame) -> DataFrame:
    """(id, u, cid): nearest centroid by fold dot product, ties →
    lowest cid. The argmax is a ``max(struct(dot, -cid))`` aggregate,
    NOT a ranking window: a struct max is partial-aggregable, so the
    n·k scored rows collapse map-side and the exchange carries one
    row per point instead of shuffling every (point × centroid) pair
    WITH its vector payload through a sort (measured ~25% off
    training wall-clock; at scale it is the difference between an
    O(n) and an O(n·k) shuffle of vector-width rows).

    The scored stream drops ``u`` BEFORE the aggregate and joins it
    back by id afterwards (r8): carrying the d-double payload through
    the n·k join→project→agg pipeline as a ``first(u)`` buffer made
    every scored row and every partial-agg buffer vector-width —
    measured 141 s vs 79 s for the u-free agg + join-back at the
    100× ladder point, with assignments verified identical row for
    row. The join shuffles n vector-width rows — the same volume the
    old agg exchange carried — so nothing gets heavier downstream."""
    best = (
        pts.crossJoin(F.broadcast(centroids))
        .select(
            "id", _dot_pre(F.col("u"), F.col("c")).alias("dot"), "cid"
        )
        .groupBy("id")
        .agg(
            F.max(
                F.struct(F.col("dot"), (-F.col("cid")).alias("ncid"))
            ).alias("best")
        )
        .select("id", (-F.col("best.ncid")).cast("long").alias("cid"))
    )
    return pts.join(best, "id").select("id", "u", "cid")


def _unit_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, u: array<double>) — L2-normalized vectors. Division by the
    fold-computed norm, element order preserved, so both engines (and
    every downstream dot product) see bitwise-identical unit vectors."""
    base = _double_base(df, id_col, vec_col)
    return base.select(
        "id", F.transform("v", lambda x: x / F.col("norm")).alias("u")
    )


def kmeans_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 2,
) -> DataFrame:
    """Trained IVF coarse quantizer: seeded spherical k-means via
    pure-DataFrame Lloyd's iterations. Returns (cid, c: array<double>)
    with unit-norm centroids.

    Every step is deterministic AND engine-portable, so the trained
    model is oracle-checkable bit-for-bit against ANSI SQL:

    - init: the k vectors ranked first by ``md5(id)`` (a seeded
      pseudo-random draw both engines compute identically), taken
      with a distributed TakeOrdered, not a full-table window
      (``_seeded_init``);
    - assign: argmax centroid by fold dot product (ties → lowest cid);
    - update: the cell mean is a positional quantized-integer
      aggregate (``_cell_means``): posexplode → per-(cid, pos) BIGINT
      sums of ``floor(val*1e9 + 0.5)`` → re-assembly ordered by pos,
      then L2-renormalized (spherical k-means, the right variant for
      cosine/IP search). Integer sums commute exactly, so the mean is
      deterministic under ANY partitioning/combine order — the
      property the previous sorted-collect_list fold bought by
      packing a whole cell's member vectors into ONE aggregation row
      (n/k × d doubles: an OOM at 100× scale). Here map-side combine
      collapses the exchange to k·d partial rows per task and no row
      ever exceeds d scalars;
    - a FIXED iteration count (no convergence test), which is what
      makes the whole training replayable as a finite SQL CTE chain.

    Scale notes: each iteration is one broadcast cross-join (n·k
    rows, k tiny), one per-point argmax, and one (k·d)-key combinable
    aggregate; centroids — O(k·d) model state, independent of data
    volume — are collected to the driver between rounds and
    re-broadcast, exactly MLlib's KMeans loop structure. The
    iterate-materialize pattern needs no checkpoint here: the loop
    re-plans from the literal centroid table each round, so plans
    stay flat.
    """
    pts = _unit_vectors(df, id_col, vec_col)
    return kmeans_centroids_on(pts, k=k, n_iter=n_iter)


def kmeans_centroids_on(pts: DataFrame, k: int, n_iter: int = 2) -> DataFrame:
    """The Lloyd loop of ``kmeans_centroids`` over a PRE-BUILT point
    frame (id, u: array<double>) — factored out so quantizers can be
    trained on derived views (vector halves for the IMI product
    quantizer, digest samples for sample-trained IVF) with the same
    deterministic, oracle-replayable steps. ``u`` need not be unit
    norm: assignment is argmax dot (an inner-product quantizer —
    equal to the cosine argmax when centroids are unit, which the
    spherical update guarantees after the first round), and every
    step stays bit-replayable in ANSI SQL regardless.

    The point frame is persisted (MEMORY_AND_DISK, released after the
    final iteration) for the loop's duration — each collect is a
    separate job that would otherwise re-run the scan + projection
    lineage from parquet every round (the same reason MLlib's KMeans
    caches its input; at 100 TB the trained set is a digest SAMPLE —
    qs16's shape — so the persisted footprint is the sample, not the
    corpus)."""
    from pyspark import StorageLevel

    spark = pts.sparkSession
    pts = pts.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        cent = _seeded_init(pts, k)
        for _ in range(n_iter):
            assigned = _argmax_assign(pts, cent)
            means = _cell_means(assigned, "cid")
            new_cent = means.select(
                "cid",
                F.transform(
                    "mv",
                    lambda x: x
                    / F.sqrt(_dot_pre(F.col("mv"), F.col("mv"))),
                ).alias("c"),
            )
            # O(k·d) model state to the driver, re-broadcast next
            # round — truncates plan growth; this is model
            # exchange, not data collection (size independent of
            # |df|).
            rows = [(r["cid"], list(r["c"])) for r in new_cent.collect()]
            cent = spark.createDataFrame(rows, "cid long, c array<double>")
    finally:
        pts.unpersist(blocking=False)
    return cent


def assign_clusters(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, u, cid): nearest-centroid assignment by fold dot product
    over unit vectors (ties → lowest cid). Broadcast cross-join +
    partial-aggregable struct-max argmax (see ``_argmax_assign``) —
    n·k scored rows collapse map-side, never n², never sorted."""
    pts = _unit_vectors(df, id_col, vec_col)
    return _argmax_assign(pts, centroids)


# Fixed-point scale for QUANTIZED-EXACT cell assignment. 2^20 keeps
# every quantized component |q| <= 2^20 (unit vectors), every product
# <= 2^40, and a d=64 dot <= 2^46 — below 2^53, so the dot is EXACT in
# int64 AND in float64 regardless of accumulation order. That is the
# property the maintenance family's builds need: a float64 dgemm over
# the quantized matrices computes bit-identical scores to the SQL fold
# (unlike raw float dots, where BLAS reordering shifts near-ties at
# ulp level and forces the rows-only convention), so an n·k corpus
# assignment can run at BLAS throughput and STAY hash-verified by a
# DuckDB oracle replaying the same quantized dots. The ~1e-6
# quantization only moves points that sit within 2^-20 of a cell
# boundary — and moves them identically in every engine.
_ASSIGN_QSCALE = 1 << 20


def _quantize_vec(col: Column) -> Column:
    """array<double> → array<long> via round-half-up at 2^20 — the
    floor(x*Q + 0.5) form every engine (Spark, DuckDB, NumPy)
    evaluates identically for all x."""
    return F.transform(
        col,
        lambda x: F.floor(
            x * F.lit(float(_ASSIGN_QSCALE)) + F.lit(0.5)
        ).cast("long"),
    )


def _qdot_exact(a: Column, b: Column) -> Column:
    """Integer dot product over quantized vectors — exact, order-free."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _argmax_assign_quant(pts: DataFrame, centroids: DataFrame) -> DataFrame:
    """(id, u, cid): nearest centroid by QUANTIZED integer dot (ties →
    lowest cid) — ``_argmax_assign`` with ``_qdot_exact`` scores. Same
    u-free scored stream + struct-max + join-back shape (see that
    docstring for the shuffle accounting); the only change is that the
    score is an exact int64, so this fold form and the dgemm form
    (``assign_clusters_quant_blas``) are bit-identical by construction."""
    qc = centroids.select("cid", _quantize_vec(F.col("c")).alias("qc"))
    best = (
        pts.select("id", _quantize_vec(F.col("u")).alias("qu"))
        .crossJoin(F.broadcast(qc))
        .select("id", _qdot_exact(F.col("qu"), F.col("qc")).alias("qdot"), "cid")
        .groupBy("id")
        .agg(
            F.max(
                F.struct(F.col("qdot"), (-F.col("cid")).alias("ncid"))
            ).alias("best")
        )
        .select("id", (-F.col("best.ncid")).cast("long").alias("cid"))
    )
    return pts.join(best, "id").select("id", "u", "cid")


def assign_clusters_quant(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, u, cid): quantized-exact nearest-centroid assignment — the
    native-expression form, used where the input is delta/batch-sized
    (maintenance deltas, streaming micro-batches) so the JVM fold is
    cheap and no Python worker round-trip is warranted. Corpus-sized
    assignments route through ``assign_clusters_quant_blas`` — same
    scores bit-for-bit (see ``_ASSIGN_QSCALE``)."""
    pts = _unit_vectors(df, id_col, vec_col)
    return _argmax_assign_quant(pts, centroids)


def ivfpq_assign_encode_quant_blas(
    pts: DataFrame,
    cent: DataFrame,
    books: "list[DataFrame]",
    m: int,
    d_sub: int,
    id_col: str = "id",
    u_col: str = "u",
    raw: bool = False,
) -> DataFrame:
    """(id, cid, codes): the ENTIRE IVFPQ corpus-side build in ONE
    Arrow pass — coarse-cell assignment AND all m PQ code selections
    per batch, every score a quantized integer a dgemm computes
    bit-identically to the SQL replay (``_ASSIGN_QSCALE``). This is
    FAISS's ``index.add()`` shape: one pass over the vectors produces
    the full inverted-list entry. The previous staged build ran the
    assignment and a separate JVM-side encode aggregate as two more
    corpus passes plus an id join; at the 2 M / 4 g rung the encode's
    128 M-row struct-max SortAggregate and the join stacked enough
    retained heap on the trainer's to kill the executor — one fused
    kernel pass has no aggregate, no join, and no second scan.

    Code selection replays the L2 rule ``argmax(dot − ‖c‖²/2)`` in
    quantized form, ``argmax(2·qdot(u_s, c) − qdot(c, c))`` — a
    positive-scaled shift of the float rule, exact in int64/float64
    (|score| ≤ 2^45), ties → lowest code id (argmax-first over
    ascending ids = the SQL ``ORDER BY score DESC, cid``). The ADC
    serving tables stay float-trained and 1e9-quantized exactly as
    before — only WHICH code represents each subvector moves (by at
    most one quantization-boundary neighbor), and the oracle replays
    the same quantized selection. Callers must
    ``ensure_package_on_workers`` first.

    ``raw=True``: ``pts`` is the RAW table (``u_col`` names the raw
    embedding column) and the kernel replays ``_unit_vectors``'s
    chain bit-exactly before quantizing (the
    ``assign_clusters_quant_blas`` raw-path argument) — no JVM HOF
    normalize, float32 across Arrow; emitted (cid, codes) integers
    are bit-identical."""
    import numpy as np

    q = float(_ASSIGN_QSCALE)
    crows = sorted((int(r["cid"]), list(r["c"])) for r in cent.collect())
    C = np.floor(np.asarray([c for _, c in crows], dtype="float64") * q + 0.5)
    cids = np.asarray([cid for cid, _ in crows], dtype="int64")
    subs = []
    for s in range(m):
        brows = sorted(
            (int(r["cid"]), list(r["c"])) for r in books[s].collect()
        )
        Bq = np.floor(
            np.asarray([c for _, c in brows], dtype="float64") * q + 0.5
        )
        bids = np.asarray([cid for cid, _ in brows], dtype="int64")
        subs.append((bids, Bq, (Bq * Bq).sum(axis=1)))

    def _run(batches):
        import numpy as _np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _np.stack(
                [_np.asarray(u, dtype="float64") for u in pdf[u_col]]
            )
            if raw:
                # _unit_vectors' bits: sequential fold norm, then one
                # exact division per element
                p = V * V
                acc = p[:, 0] + 0.0
                for i in range(1, p.shape[1]):
                    acc = acc + p[:, i]
                V = V / _np.sqrt(acc)[:, None]
            U = _np.floor(V * q + 0.5)
            cells = cids[_np.argmax(U @ C.T, axis=1)]
            codes = _np.empty((len(pdf), m), dtype="int64")
            for s, (bids, Bq, qcc) in enumerate(subs):
                Us = U[:, s * d_sub : (s + 1) * d_sub]
                codes[:, s] = bids[
                    _np.argmax(2.0 * (Us @ Bq.T) - qcc[None, :], axis=1)
                ]
            yield pd.DataFrame(
                {"id": pdf[id_col], "cid": cells, "codes": codes.tolist()}
            )

    src = pts.select(
        F.col(id_col).alias(id_col), F.col(u_col).alias(u_col)
    )
    if raw:
        # the cluster-width repartition _double_base would have
        # applied — the fused n·(k + m·k_pq) kernel must not inherit
        # a few fat scan splits
        src = src.repartition(
            pts.sparkSession.sparkContext.defaultParallelism
        )
    return src.mapInPandas(_run, schema="id long, cid long, codes array<long>")


def kmeans_centroids_quant_on(
    pts: DataFrame, k: int, n_iter: int = 2
) -> DataFrame:
    """``kmeans_centroids_on`` with every per-iteration assignment on
    the QUANTIZED dgemm kernel — the throughput trainer that stays
    hash-verified (the oracle chain replays quantized dots at every
    iteration, not just the final assignment). Init, the
    quantized-integer cell means, and the spherical renormalize are
    byte-identical to the fold trainer's steps; ONLY the argmax score
    changes, and it changes identically in every engine (see
    ``_ASSIGN_QSCALE``). Used by the maintenance/IVFPQ-store builds,
    where the sample×k assignment (45k × 1414 cells at the 2 M rung)
    is the dominant build cost the fold evaluator cannot afford; the
    generic fold trainer remains the form the qs7/qs14/qs16 oracle
    family replays. Callers must ``ensure_package_on_workers``."""
    from pyspark import StorageLevel

    spark = pts.sparkSession
    pts = pts.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        cent = _seeded_init(pts, k)
        for _ in range(n_iter):
            asg = assign_clusters_quant_blas(pts, cent)
            assigned = pts.join(asg, "id").select("id", "u", "cid")
            means = _cell_means(assigned, "cid")
            new_cent = means.select(
                "cid",
                F.transform(
                    "mv",
                    lambda x: x
                    / F.sqrt(_dot_pre(F.col("mv"), F.col("mv"))),
                ).alias("c"),
            )
            rows = [(r["cid"], list(r["c"])) for r in new_cent.collect()]
            cent = spark.createDataFrame(rows, "cid long, c array<double>")
    finally:
        pts.unpersist(blocking=False)
    return cent


def kmeans_centroids_quant(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 2,
) -> DataFrame:
    """``kmeans_centroids`` on the quantized-throughput Lloyd loop
    (``kmeans_centroids_quant_on``)."""
    return kmeans_centroids_quant_on(
        _unit_vectors(df, id_col, vec_col), k=k, n_iter=n_iter
    )


def assign_clusters_quant_blas(
    pts: DataFrame,
    cent: DataFrame,
    id_col: str = "id",
    u_col: str = "u",
    raw: bool = False,
) -> DataFrame:
    """(id, cid): quantized-exact assignment at dgemm throughput — the
    BUILD-time kernel for n·k corpus routing that stays HASH-VERIFIED.
    Quantizes both sides at 2^20 and scores each Arrow batch as one
    float64 matmul; every score is an integer below 2^46, so the BLAS
    accumulation order cannot shift it (see ``_ASSIGN_QSCALE``) and
    the result is bit-identical to ``assign_clusters_quant``'s fold —
    unlike a raw-float dgemm (the r10 form this superseded), whose
    reordered accumulation flips near-ties at ulp level and forced
    consumers to rows-only. Ties break to the
    lowest cid (argmax-first over ascending-cid rows — the fold's
    ``max(struct(dot, -cid))`` order). Callers must
    ``ensure_package_on_workers`` first.

    ``raw=True``: ``pts`` is the RAW table (``u_col`` names the raw
    embedding column) and the kernel computes the unit vectors itself
    — bit-exactly replaying ``_unit_vectors``'s chain (exact
    float→double cast, sequential-fold norm, ``sqrt``, one exact
    division per element — the ``_topn_probe_ranks_halves_blas``
    argument) before quantizing. This removes the JVM HOF normalize
    (two transient array<double> allocations per corpus row — 182 s
    of GC in the 56 s manifest-build assignment stage at the 2 M
    rung) and ships float32 across Arrow instead of float64; it adds
    the cluster-width repartition ``_double_base`` would have
    applied, since the caller's ``_unit_vectors`` is skipped."""
    import numpy as np

    q = float(_ASSIGN_QSCALE)
    rows = sorted((int(r["cid"]), list(r["c"])) for r in cent.collect())
    C = np.floor(
        np.asarray([c for _, c in rows], dtype="float64") * q + 0.5
    )
    cids = np.asarray([cid for cid, _ in rows], dtype="int64")

    def _assign(batches):
        import numpy as _np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _np.vstack(pdf[u_col].to_numpy()).astype(
                "float64", copy=False
            )
            if raw:
                # _unit_vectors' bits: sequential fold norm, then one
                # exact division per element
                p = V * V
                acc = p[:, 0] + 0.0
                for i in range(1, p.shape[1]):
                    acc = acc + p[:, i]
                V = V / _np.sqrt(acc)[:, None]
            U = _np.floor(V * q + 0.5)
            best = cids[_np.argmax(U @ C.T, axis=1)]
            yield pd.DataFrame({"id": pdf[id_col], "cid": best})

    src = pts.select(
        F.col(id_col).alias(id_col), F.col(u_col).alias(u_col)
    )
    if raw:
        src = src.repartition(
            pts.sparkSession.sparkContext.defaultParallelism
        )
    return src.mapInPandas(_assign, schema="id long, cid long")


def cosine_topk_kmeans(
    df: DataFrame,
    k_neighbors: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    n_iter: int = 2,
) -> DataFrame:
    """IVF proper: top-k cosine neighbors with candidates restricted
    to the same TRAINED k-means cell — ``cosine_topk_bucketed`` with
    learned centroids instead of sign bits. Data-adaptive cells beat
    fixed sign-hyperplanes on clustered embeddings (recall at equal
    candidate volume); candidate generation stays a pure equi-join on
    the cluster id. Cosine over unit vectors = the fold dot product,
    so results stay oracle-checkable end-to-end, training included."""
    from pyspark.sql import Window as W

    cent = kmeans_centroids(df, id_col, vec_col, k=n_clusters, n_iter=n_iter)
    # hash-repartition by the join key: both self-join sides then
    # demand the SAME exchange, so ReuseExchange computes the
    # assignment subplan once (the same trick ngram_jaccard_pairs
    # uses on its posting list) — free at scale, where the equi-join
    # would shuffle on cid anyway
    asg = assign_clusters(df, cent, id_col, vec_col).repartition(F.col("cid"))
    a, b = asg.alias("a"), asg.alias("b")
    cos = _dot_pre(F.col("a.u"), F.col("b.u"))
    pairs = a.join(
        b,
        (F.col("a.cid") == F.col("b.cid")) & (F.col("a.id") != F.col("b.id")),
    ).select(
        F.col("a.cid").alias("cid"),
        F.col("a.id").alias("query_id"),
        F.col("b.id").alias("neighbor_id"),
        cos.alias("cosine"),
    )
    # cell-local top-k: rank within (cid, query_id) equals the global
    # per-query rank (single-probe — every candidate shares the
    # query's cell), and the cid partitioning from the join satisfies
    # the window's clustering, so the n·√n pair stream is never
    # re-exchanged on query_id; WindowGroupLimit prunes during sort.
    w = W.partitionBy("cid", "query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k_neighbors)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cell_fill_report(
    centroids: DataFrame,
    n_old: DataFrame,
    n_new: DataFrame,
    expected: int,
) -> DataFrame:
    """Per-cell fill accounting shared by the self-contained qs22
    query and the manifest-backed maintainer, so both produce the
    IDENTICAL report schema/values: (cid, n_indexed, n_delta,
    n_total, overfull) where ``overfull = n_total > 2·expected`` —
    the integer-exact drift signal that the O(n) sample trainer
    should re-run. ``n_old``/``n_new`` are (cid, n_indexed) /
    (cid, n_delta) count frames; both joins are left from the k-row
    centroid table, so the report is index-sized (k ≈ √n rows) at
    any corpus size."""
    total = F.coalesce(F.col("n_indexed"), F.lit(0)) + F.coalesce(
        F.col("n_delta"), F.lit(0)
    )
    return (
        centroids.select("cid")
        .join(n_old, "cid", "left")
        .join(n_new, "cid", "left")
        .select(
            "cid",
            F.coalesce(F.col("n_indexed"), F.lit(0)).cast("long").alias(
                "n_indexed"
            ),
            F.coalesce(F.col("n_delta"), F.lit(0)).cast("long").alias(
                "n_delta"
            ),
            total.cast("long").alias("n_total"),
            (total > F.lit(2 * expected)).cast("long").alias("overfull"),
        )
    )


def write_index_manifest(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    meta: dict | None = None,
) -> None:
    """Persist the trained-IVF INDEX MANIFEST at build time — the
    stored state that makes recurring maintenance delta-proportional
    (the qd11 signature-store pattern, ``dedup.py:826``, applied to
    the ANN lifecycle): ``path/centroids`` holds the O(k·d) model,
    ``path/cells`` the per-cell ``n_indexed`` counts (k rows — the
    corpus-side accounting paid ONCE here, at build, where the n·k
    assignment pass is already being run to route vectors), and
    ``path/meta.json`` the sizing arithmetic (n, k, expected, plus
    caller extras) a maintainer needs to evaluate the overfull
    threshold without touching the corpus. FAISS deployments persist
    exactly this state between add-without-train loops; a 100 TB
    maintainer then pays O(|delta|·k) per batch instead of the ×149
    corpus recount the self-contained qs22 query measures.

    The write stages everything into a uuid-suffixed tmp directory
    that renames into place, so a reader never sees a HALF-WRITTEN
    manifest and a concurrent builder loses only its redundant copy.
    Replacing a stale manifest is two renames (old aside, new in) —
    POSIX rename cannot replace a non-empty directory, so a reader
    racing exactly between them can see the path MISSING for a
    moment (never partial); ``read_index_manifest`` absorbs that
    transient with one retry. The aside-dir is deleted only AFTER
    the new manifest is live, so mid-read file handles on the old
    generation stay valid through the swap on POSIX semantics.

    Worker-side dependency: the corpus assignment routes through
    ``assign_clusters_quant_blas`` (``mapInPandas`` dgemm — bit-exact
    vs the SQL fold, see ``_ASSIGN_QSCALE``), so Python workers need
    NumPy/pandas/Arrow at build time; ``ensure_package_on_workers``
    ships this package. Callers with delta-sized corpora that must
    stay pure-JVM can assign via ``assign_clusters_quant`` and write
    the same layout."""
    import json
    import os
    import shutil
    import uuid

    from spotify_pipeline_gcp_spark.pyfiles import ensure_package_on_workers

    # the ONE n·k pass in the manifest lifecycle — at 2 M × √n cells
    # the interpreted fold form is the >600 s build wall
    # (SCALE_BENCH_r10's qst7 timeout); quantized-exact dgemm scores
    # are bit-identical to the fold, so routing the build through
    # BLAS keeps the drained report hash-verified (_ASSIGN_QSCALE)
    ensure_package_on_workers(corpus.sparkSession)
    # raw=True: the kernel unit-normalizes bit-exactly itself — no JVM
    # HOF pass over the corpus, float32 across the Arrow boundary
    # (session-4 rung A/B: build 86.4 -> see OPTIMIZATION_r14.md)
    asg = assign_clusters_quant_blas(
        corpus, centroids, id_col=id_col, u_col=vec_col, raw=True
    )
    cells = asg.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_indexed")
    )
    token = uuid.uuid4().hex[:12]
    tmp = f"{path}.tmp.{token}"
    centroids.write.mode("overwrite").parquet(os.path.join(tmp, "centroids"))
    cells.write.mode("overwrite").parquet(os.path.join(tmp, "cells"))
    with open(os.path.join(tmp, "meta.json"), "w") as fh:
        json.dump(meta or {}, fh)
    old = None
    if os.path.isdir(path):
        # replacing a STALE manifest: move it aside — but keep it on
        # disk until the replacement is live (see docstring)
        old = f"{path}.old.{token}"
        try:
            os.rename(path, old)
        except OSError:
            old = None
    try:
        os.rename(tmp, path)
    except OSError:
        # lost a build race: a complete manifest is already in place
        shutil.rmtree(tmp, ignore_errors=True)
    if old is not None:
        shutil.rmtree(old, ignore_errors=True)


def read_index_manifest(spark, path: str):
    """(centroids_df, cells_df, meta_dict) from a
    ``write_index_manifest`` directory. One retry absorbs the
    transient between a concurrent replacer's two renames (the path
    can be briefly MISSING mid-swap — never half-written; see the
    writer's docstring)."""
    import json
    import os
    import time

    def _read():
        cent = spark.read.parquet(os.path.join(path, "centroids"))
        cells = spark.read.parquet(os.path.join(path, "cells"))
        with open(os.path.join(path, "meta.json")) as fh:
            meta = json.load(fh)
        return cent, cells, meta

    try:
        return _read()
    except Exception:
        time.sleep(0.2)
        return _read()


def maintain_index(
    spark,
    manifest_path: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The RECURRING maintenance step against a stored manifest: the
    production add-without-retrain loop whose per-batch cost is
    O(|delta|·k) assignment + a k-row join — NOTHING corpus-sized.
    Reads the trained centroids + per-cell ``n_indexed`` from the
    manifest (``write_index_manifest``), assigns the new batch to the
    stored cells via one broadcast scoring pass, and emits the same
    (cid, n_indexed, n_delta, n_total, overfull) fill report as the
    self-contained qs22 audit — byte-identical semantics via the
    shared ``cell_fill_report``, with the corpus side read from
    state instead of recounted."""
    cent, cells, meta = read_index_manifest(spark, manifest_path)
    n_new = (
        assign_clusters_quant(delta, cent, id_col, vec_col)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_delta"))
    )
    return cell_fill_report(cent, cells, n_new, int(meta["expected"]))


def _topn_probe_ranks(
    pts: DataFrame, centroids: DataFrame, nprobe: int
) -> DataFrame:
    """SKINNY probe table (id, cid, probe_rank) — ``_topn_probes``
    without the u join-back, for callers that attach payloads
    themselves (or need the rank table twice — it is three longs per
    row, checkpointable at any scale)."""
    # u-free scored stream (the _argmax_assign r8 fix)
    scored = pts.crossJoin(F.broadcast(centroids)).select(
        "id", _dot_pre(F.col("u"), F.col("c")).alias("dot"), "cid"
    )
    best = scored.groupBy("id").agg(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct((-F.col("dot")).alias("nd"), F.col("cid")))
            ),
            1,
            nprobe,
        ).alias("top")
    )
    return best.select(
        "id", F.posexplode("top").alias("pos", "p")
    ).select(
        "id",
        F.col("p.cid").alias("cid"),
        (F.col("pos") + 1).cast("long").alias("probe_rank"),
    )


def _topn_probe_ranks_halves(
    pts: DataFrame,
    cent1: DataFrame,
    cent2: DataFrame,
    d_half: int,
    nprobe: int,
    work_rows: int | None = None,
) -> DataFrame:
    """(id, t1, t2): BOTH halves' top-``nprobe`` probe lists from ONE
    scored stream — ``imi_assign``'s tagged-union trick generalized
    from argmax to top-n. The two sub-quantizers' centroids union
    into one broadcast table tagged ``q`` ∈ {1, 2}; each point scores
    all 2·k_each in a single crossJoin, and ONE map-side-combinable
    aggregation collects both halves' (−dot, cid) lists (``when`` →
    null → collect_list skips), sorts, and slices. Same dots, same
    per-half tie order (ties → lowest cid) as two separate
    ``_topn_probe_ranks`` passes — but one scan, one unit-vector
    build, one exchange instead of two of each (the r14 qs28
    stageprof measured each separate half-chain at ~80 s on 2 M
    vectors). ``t[0]`` is the assigned cell (probe rank 1).

    ``work_rows`` (= corpus rows × 2·k_each, which callers already
    know — no counting job) pre-widens the point stream so the
    tagged scored slice per task stays sort/spill-friendly (see
    ``_widen_for_scoring``): the union DOUBLES per-task scored rows
    vs a separate per-half pass, which is precisely the qs25 r11
    partial-SortAggregate OOM class — the unwidened tagged form died
    at the 2 M-vector rung in 4 g where the two separate chains
    (half the slice each) had survived."""
    c1 = cent1.select(F.lit(1).alias("q"), "cid", "c")
    c2 = cent2.select(F.lit(2).alias("q"), "cid", "c")
    cents = c1.unionByName(c2)
    halved = _widen_for_scoring(
        pts.select(
            "id",
            F.slice("u", 1, d_half).alias("u1"),
            F.slice("u", d_half + 1, d_half).alias("u2"),
        ),
        work_rows,
    )
    scored = halved.crossJoin(F.broadcast(cents)).select(
        "id",
        "q",
        "cid",
        F.when(F.col("q") == 1, _dot_pre(F.col("u1"), F.col("c")))
        .otherwise(_dot_pre(F.col("u2"), F.col("c")))
        .alias("dot"),
    )
    entry = F.struct((-F.col("dot")).alias("nd"), F.col("cid"))
    return scored.groupBy("id").agg(
        F.slice(
            F.array_sort(F.collect_list(F.when(F.col("q") == 1, entry))),
            1,
            nprobe,
        ).alias("t1"),
        F.slice(
            F.array_sort(F.collect_list(F.when(F.col("q") == 2, entry))),
            1,
            nprobe,
        ).alias("t2"),
    )


def _topn_probe_ranks_halves_blas(
    pts: DataFrame,
    cent1: DataFrame,
    cent2: DataFrame,
    d_half: int,
    nprobe: int,
    with_u: bool = False,
    cids_only: bool = False,
    raw: tuple[str, str] | None = None,
    emit_raw: bool = False,
) -> DataFrame:
    """``_topn_probe_ranks_halves`` as a vectorized per-row map — the
    BIT-EXACT fold twin (not the quantized kernel): emits the same
    (id, t1, t2) rows, same double bits, same tie order, so qs28's
    hash-verified oracle (which replays the FLOAT fold chain) is
    untouched while the Θ(n·2k·d) scoring runs as NumPy array ops
    instead of a 2k-way crossJoin + interpreted HOF fold + struct
    SortAggregate (the measured ~100 s term of the qs28 rung row).

    Bit-exactness argument: ``_dot_pre`` is ``aggregate(zip_with(a, b,
    x*y), 0.0, acc+v)`` — each product rounded once, then a SEQUENTIAL
    left-to-right sum, each add rounded once. The kernel replays
    exactly that: one elementwise multiply per dimension, accumulated
    in dimension order with one rounded add each (never ``U @ C.T``,
    whose accumulation order differs at ulp level), the ``0.0`` init
    reproduced as ``p0 + 0.0`` (normalizes a ``-0.0`` first product
    the way the fold's ``0.0 + p0`` does — IEEE addition commutes
    bitwise). Probe selection replays ``array_sort``'s struct order
    ((nd, cid) ascending, Double.compare semantics) via an IEEE
    total-order int64 key (−0.0 < +0.0, NaN greatest) with a stable
    argsort over cid-ascending columns. Verified: 0 bit-mismatches vs
    the fold on real corpora (tests/test_similarity.py pins kernel ==
    fold on sf0.001), and qs28 stays hash-verified at sf0.01/sf0.1.

    No exchange at all: the fold form's scored stream needed a
    groupBy (2k scored rows per point through a partial
    SortAggregate — the ``_widen_for_scoring`` OOM class); here each
    point's probe lists are computed row-locally in its scan task, so
    the guard is unnecessary by construction. Model side is one
    k-bounded collect per half (the BLAS-kernel convention —
    ``assign_clusters_quant_blas``'s accounting). Per-task transient
    is chunked to ~4M score cells regardless of k.

    ``with_u=True`` passes the unit vector through UNTOUCHED (Arrow
    float64 round-trip — bit-lossless) so consumers that need (id, u,
    probes) — qs28's two packing sides — read them from the ONE
    checkpointed kernel output instead of joining ``pts`` back (which
    re-ran scan + unit-normalize + an id-keyed join sort per
    consumer: the 52 s + 43 s stages of the 102 s rung row).

    ``cids_only=True`` emits t1/t2 as plain ``array<bigint>`` probe
    cid lists (rank order) instead of (nd, cid) structs — identical
    cid selection, narrower payload. **A/B measured and NOT adopted**
    (session 4, 5 M rung, same data, fresh 4 g JVMs): struct form
    61.4/70.4/74.5 s vs cid-only 77.9/82.4 s — the hypothesis that
    per-row dict building + list<struct> Arrow conversion dominated
    the materialization stage did not hold (the stage's cost is the
    checkpoint + packing-exchange serialization of ``u``, which both
    forms carry). qs28 keeps the struct form; the flag stays for the
    measurement's reproducibility and the pytest pin.

    ``raw=(id_col, vec_col)``: ``pts`` is the RAW table and the
    kernel computes the unit vectors itself, bit-exactly replaying
    ``_unit_vectors``'s chain — cast float→double (exact), norm =
    ``sqrt(fold(zip_with(v, v, x*y), 0.0, acc+v))`` as the same
    sequential multiply-add (``np.sqrt`` and Java ``Math.sqrt`` are
    both IEEE correctly-rounded), then one exact division per
    element. This removes the JVM HOF normalize (two transient
    array<double> allocations per row — the GC source of the
    materialization stage) and ships float32 across Arrow instead of
    float64 (half the boundary bytes); the emitted ``u`` doubles are
    the same bits the JVM fold would have produced (pytest-pinned).

    ``emit_raw=True`` (requires ``raw`` + ``with_u``): the ``u``
    column passes the RAW float32 vector through untouched instead of
    the computed float64 unit vector, so the checkpoint and BOTH
    packing exchanges downstream carry half the bytes; the consumer's
    scoring kernel re-normalizes bit-exactly
    (``_blas_topk_from_combos(raw=True)``)."""
    import numpy as np
    import pandas as pd

    def _model(cent):
        rows = sorted(cent.collect(), key=lambda r: r["cid"])
        cids = np.array([int(r["cid"]) for r in rows], dtype="int64")
        mat = np.array([list(r["c"]) for r in rows], dtype="float64")
        return cids, mat

    cids1, c1m = _model(cent1)
    cids2, c2m = _model(cent2)
    take1, take2 = min(nprobe, len(cids1)), min(nprobe, len(cids2))
    # per-chunk transient: rows × (k1 + k2) float64 score cells ≈ 32 MB
    chunk = max(1, 4_000_000 // max(len(cids1) + len(cids2), 1))

    def _fold_dots(u_mat, c_mat):
        # sequential multiply-add, one rounding per op — _dot_pre's bits
        acc = u_mat[:, 0][:, None] * c_mat[None, :, 0] + 0.0
        for i in range(1, c_mat.shape[1]):
            acc = acc + u_mat[:, i][:, None] * c_mat[None, :, i]
        return acc

    def _tok(a):
        # IEEE-754 total-order int64 key: monotone with Double.compare
        # (−0.0 < +0.0, NaN above all) — what array_sort uses on nd
        bits = a.view(np.int64)
        return np.where(bits >= 0, bits, np.int64(-1) - (bits - np.int64(-(2**63))))

    def _top(u_mat, cids, c_mat, take):
        nd = -_fold_dots(u_mat, c_mat)
        idx = np.argsort(_tok(nd), axis=1, kind="stable")[:, :take]
        sel = cids[idx]
        if cids_only:
            return list(sel)  # one int64 ndarray per row → list<bigint>
        vals = np.take_along_axis(nd, idx, axis=1)
        return [
            [{"nd": float(v), "cid": int(c)} for v, c in zip(vr, cr)]
            for vr, cr in zip(vals, sel)
        ]

    def kernel(batches):
        for pdf in batches:
            for lo in range(0, len(pdf), chunk):
                part = pdf.iloc[lo : lo + chunk]
                cols = {"id": part["id"].to_numpy()}
                if raw is not None:
                    v_mat = np.vstack(part["v"].to_numpy()).astype("float64")
                    # _unit_vectors' bits: sequential fold norm, then
                    # one exact division per element
                    p = v_mat * v_mat
                    acc = p[:, 0] + 0.0
                    for i in range(1, p.shape[1]):
                        acc = acc + p[:, i]
                    u_mat = v_mat / np.sqrt(acc)[:, None]
                    if with_u:
                        # emit_raw: float32 passthrough, no numeric
                        # conversion — the scoring kernel re-derives u
                        cols["u"] = (
                            part["v"].to_numpy()
                            if emit_raw
                            else list(u_mat)
                        )
                else:
                    u_mat = np.vstack(part["u"].to_numpy()).astype(
                        "float64", copy=False
                    )
                    if with_u:
                        # passthrough, no numeric conversion — exact
                        cols["u"] = part["u"].to_numpy()
                cols["t1"] = _top(u_mat[:, :d_half], cids1, c1m, take1)
                cols["t2"] = _top(u_mat[:, d_half:], cids2, c2m, take2)
                yield pd.DataFrame(cols)

    if emit_raw and (raw is None or not with_u):
        raise ValueError("emit_raw requires raw input and with_u")
    u_type = (
        pts.schema[raw[1]].dataType.simpleString()
        if emit_raw
        else "array<double>"
    )
    u_field = f"u {u_type}, " if with_u else ""
    t_type = (
        "array<bigint>" if cids_only else "array<struct<nd: double, cid: bigint>>"
    )
    if raw is not None:
        id_col, vec_col = raw
        # same cluster-width repartition _double_base applies: the
        # parquet scan splits into few large partitions, and the
        # kernel fuses into the scan stage — the skinny float32
        # exchange buys full-width parallelism (r8's measured fix)
        src = pts.repartition(
            pts.sparkSession.sparkContext.defaultParallelism
        ).select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    else:
        src = pts.select("id", "u")
    return src.mapInPandas(
        kernel,
        schema=f"id bigint, {u_field}t1 {t_type}, t2 {t_type}",
    )


def _topn_probes(pts: DataFrame, centroids: DataFrame, nprobe: int) -> DataFrame:
    """(id, u, cid, probe_rank): each point's top-``nprobe`` nearest
    cells by dot product (ties → lowest cid) — ``_argmax_assign``
    generalized to n probes. The per-point top-n is a groupBy
    aggregate over the k scored rows: collect the k tiny (−dot, cid)
    structs row-local, sort, slice — partial-aggregable like the
    struct-max, so there is no ranking window and no sort of the n·k
    scored table; the row payload is bounded by k (the centroid
    count), never by data. Negating dot for the ascending sort is
    exact (IEEE sign flip) and cid stays positive, so ties break to
    the LOWEST cid — the same total order the assignment argmax uses,
    which guarantees ``probe_rank`` 1 == the assigned cell (so
    callers needing the assignment filter on it instead of scoring
    the points a second time)."""
    probes = _topn_probe_ranks(pts, centroids, nprobe)
    return pts.join(probes, "id").select("id", "u", "cid", "probe_rank")


def cosine_topk_kmeans_multiprobe(
    df: DataFrame,
    k_neighbors: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    n_iter: int = 2,
    nprobe: int = 2,
) -> DataFrame:
    """Trained IVF with nprobe > 1 — the production recall/cost knob.

    ``cosine_topk_kmeans`` (qs7) probes exactly the assigned cell; a
    query sitting near a cell boundary misses neighbors filed one
    cell over. Here each query probes its ``nprobe`` nearest TRAINED
    centroids (``_topn_probes``) while the database side stays in its
    single assigned cell, so candidate volume grows ~linearly in
    nprobe while recall climbs toward exact (nprobe = k IS brute
    force). This composes the qs5 multi-probe trick with the qs7
    learned quantizer — the missing rung between them. Candidate
    generation remains a pure equi-join on the cell id; each (query,
    neighbor) pair arises at most once because the database vector
    lives in exactly one cell. Exact fold verification inside the
    probed cells keeps the whole query oracle-checkable, training
    included.

    The database side's single-cell assignment is NOT a second
    scoring pass: probe rank 1 IS the argmax assignment (same total
    order — see ``_topn_probes``), so both join sides are the SAME
    ranked-probes subplan behind the SAME cid repartition, with the
    ``probe_rank = 1`` restriction applied as a join-side filter
    ABOVE the exchange. ReuseExchange then computes the n·k scoring
    once and the second side replays the shuffle files — the shuffle
    carries n·nprobe rows instead of n, a small trade for halving
    the dominant cross-join+fold cost."""
    from pyspark.sql import Window as W

    cent = kmeans_centroids(df, id_col, vec_col, k=n_clusters, n_iter=n_iter)
    pts = _unit_vectors(df, id_col, vec_col)
    probes = _topn_probes(pts, cent, nprobe).repartition(F.col("cid"))
    cos = _dot_pre(F.col("a.u"), F.col("b.u"))
    pairs = probes.alias("a").join(
        probes.alias("b"),
        (F.col("a.cid") == F.col("b.cid"))
        & (F.col("b.probe_rank") == F.lit(1))
        & (F.col("a.id") != F.col("b.id")),
    ).select(
        F.col("a.id").alias("query_id"),
        F.col("b.id").alias("neighbor_id"),
        cos.alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return pairs.withColumn("rank", F.row_number().over(w).cast("long")).where(
        F.col("rank") <= k_neighbors
    )


def cosine_topk_kmeans_blas(
    df: DataFrame,
    k_neighbors: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    n_iter: int = 2,
    n_sub: int | None = None,
    train_df: DataFrame | None = None,
    blas_assign: bool = False,
    cent: DataFrame | None = None,
    quant: bool = False,
    raw: bool = True,
) -> DataFrame:
    """Trained IVF at BLAS speed: the production composition. k-means
    cells from ``kmeans_centroids`` provide the candidate pruning
    (each cell packs into one block and scores against itself — no
    candidate join at all, the cell IS the block) and the Arrow/NumPy
    matmul kernel provides the throughput, exactly
    ``cosine_topk_bucketed_blas`` with learned cells instead of sign
    bits. ``n_sub`` sub-splits oversized cells by id-hash (the salt
    for skewed clusters; size so one block is ~64-256 MB at scale).
    With ``quant=False`` float accumulation order differs from the
    SQL fold at ulp level, so that mode is rows-only;
    ``cosine_topk_kmeans`` is the oracle-checked exactness twin over
    the SAME cells. ``quant=True`` scores the packed cells with the
    QUANTIZED-EXACT kernel (``_blas_topk_from_combos``) — integer
    dots of 2^20-rounded unit vectors, bit-replayable by the oracle
    — and with ``blas_assign`` also routes the n·k assignment
    through the quantized dgemm (``assign_clusters_quant_blas``), so
    BOTH n^1.5 terms stay matmul-speed AND hash-verified. ``train_df``
    (a digest sample in the production shape — qs23) restricts the
    trainer's input; assignment and search stay full-corpus.
    ``blas_assign`` moves the n·k assignment scoring into the same
    Arrow/NumPy kernel (one ``argmax(U @ Cᵀ)`` mapInPandas pass, the
    ``kmeans_centroids_blas`` shape) — with k = √n cells the
    assignment is the OTHER n^1.5 term, so at scale it needs the
    matmul constant as much as the search does. np.argmax takes the
    first maximum, matching the fold's ties-to-lowest-cid order up
    to ulp accumulation differences (requires a long-typed id).
    ``cent`` accepts a PRE-TRAINED centroid frame (the
    train-once-serve-many split; qs23 passes the memoized shared
    'ivf:' model).

    ``raw=True`` (default, ``blas_assign`` only): the assignment
    kernel takes the RAW embedding table, replays ``_unit_vectors``'s
    chain bit-exactly itself (the ``assign_clusters_quant_blas``
    raw-path argument) and passes the raw float32 vector through to
    the packed search blocks, whose kernel re-normalizes the same way
    (``_blas_topk_from_combos(raw=True)``). No JVM HOF normalize, and
    the assignment boundary + packing shuffle carry float32 — half
    the bytes. Emitted rows are bit-identical (pytest-pinned); the
    fold-assignment path (``blas_assign=False``) is untouched."""
    if cent is None:
        cent = kmeans_centroids(
            train_df if train_df is not None else df,
            id_col,
            vec_col,
            k=n_clusters,
            n_iter=n_iter,
        )
    pack_raw = raw and blas_assign
    if blas_assign:
        import numpy as np

        qscale = float(_ASSIGN_QSCALE)
        rows = sorted((r["cid"], list(r["c"])) for r in cent.collect())
        C = np.asarray([c for _, c in rows], dtype="float64")
        if quant:
            # quantized-exact assignment dots (the
            # assign_clusters_quant_blas arithmetic, keeping u in the
            # output row for the packed search blocks)
            C = np.floor(C * qscale + 0.5)
        cids = np.asarray([cid for cid, _ in rows], dtype="int64")
        if raw:
            vec_t = df.schema[vec_col].dataType.simpleString()
            # same cluster-width repartition _double_base applies —
            # the n·k kernel must not fuse into a few fat scan splits
            pts = df.repartition(
                df.sparkSession.sparkContext.defaultParallelism
            ).select(F.col(id_col).alias("id"), F.col(vec_col).alias("u"))
        else:
            vec_t = "array<double>"
            pts = _unit_vectors(df, id_col, vec_col)

        def _assign(batches):
            import numpy as _np
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                U = _np.stack(
                    [_np.asarray(u, dtype="float64") for u in pdf["u"]]
                )
                if raw:
                    # _unit_vectors' bits: sequential fold norm, then
                    # one exact division per element
                    p = U * U
                    acc = p[:, 0] + 0.0
                    for i in range(1, p.shape[1]):
                        acc = acc + p[:, i]
                    U = U / _np.sqrt(acc)[:, None]
                if quant:
                    U = _np.floor(U * qscale + 0.5)
                best = cids[_np.argmax(U @ C.T, axis=1)]
                yield pd.DataFrame(
                    {"id": pdf["id"], "v": pdf["u"], "bucket": best}
                )

        asg = pts.mapInPandas(
            _assign, schema=f"id long, v {vec_t}, bucket long"
        )
    else:
        asg = assign_clusters(df, cent, id_col, vec_col).select(
            "id", F.col("u").alias("v"), F.col("cid").alias("bucket")
        )
    if n_sub is None:
        # expected cell bytes = scan_bytes / k; sub-split so the
        # average packed block stays task-sized (see
        # cosine_topk_bucketed_blas — output rows are invariant)
        est = _scan_bytes_est(df)
        n_sub = (
            max(1, math.ceil(est / n_clusters / _BLAS_BLOCK_BYTES))
            if est
            else 1
        )
    if n_sub > 1:
        asg = asg.withColumn("sub", F.pmod(F.xxhash64("id"), F.lit(n_sub)))
        packed = asg.groupBy("bucket", "sub").agg(
            F.collect_list(F.struct("id", "v")).alias("items")
        )
        combos = (
            packed.alias("a")
            .join(packed.alias("b"), F.col("a.bucket") == F.col("b.bucket"))
            .select(
                F.col("a.items").alias("q_items"),
                F.col("b.items").alias("d_items"),
            )
        )
    else:
        packed = asg.groupBy("bucket").agg(
            F.collect_list(F.struct("id", "v")).alias("items")
        )
        combos = packed.select(
            F.col("items").alias("q_items"), F.col("items").alias("d_items")
        )
    return _blas_topk_from_combos(combos, k_neighbors, quant=quant, raw=pack_raw)



def kmeans_centroids_blas(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 2,
) -> "list":
    """Throughput twin of ``kmeans_centroids``: same seeded init and
    Lloyd's structure, but each round is ONE ``mapInPandas`` pass
    emitting per-partition partial (cluster, count, sum-vector) rows
    — the MLlib KMeans shape. Assignment is a NumPy matmul (argmax
    ties to lowest cid via argmax-first semantics) and the driver
    combines O(partitions × k) partials into new centroids — model
    state only, never data. BLAS accumulation differs from the SQL
    fold at ulp level, so this trainer has no oracle; the exact
    trainer is the hash-verified twin (agreement on separable data
    asserted in tests). Returns the centroid list [(cid, [c...])].
    """
    import numpy as np

    from spotify_pipeline_gcp_spark.pyfiles import ensure_package_on_workers

    spark = df.sparkSession
    ensure_package_on_workers(spark)
    pts = _unit_vectors(df, id_col, vec_col)
    init = _seeded_init(pts, k).collect()
    cent = np.stack(
        [
            np.asarray(r["c"], dtype="float64")
            for r in sorted(init, key=lambda r: r["cid"])
        ]
    )

    d = cent.shape[1]
    for _ in range(n_iter):
        C = cent  # closure capture: k x d ndarray, ~KBs

        def partials(batches):
            import pandas as pd

            for pdf in batches:
                U = np.stack([np.asarray(u, dtype="float64") for u in pdf["u"]])
                cids = np.argmax(U @ C.T, axis=1)
                rows = []
                for cid in np.unique(cids):
                    members = U[cids == cid]
                    rows.append(
                        (int(cid), int(members.shape[0]), members.sum(axis=0).tolist())
                    )
                yield pd.DataFrame(rows, columns=["cid", "cnt", "psum"])

        agg = pts.select("u").mapInPandas(
            partials, schema="cid long, cnt long, psum array<double>"
        ).collect()
        sums = np.zeros((k, d))
        counts = np.zeros(k)
        for r in agg:
            sums[r["cid"]] += np.asarray(r["psum"])
            counts[r["cid"]] += r["cnt"]
        live = counts > 0
        means = sums[live] / counts[live, None]
        cent = means / np.linalg.norm(means, axis=1, keepdims=True)
    return [(i, cent[i].tolist()) for i in range(cent.shape[0])]


def _widen_for_scoring(
    df: DataFrame, work_rows: int | None, rows_per_task: int = 1_500_000
) -> DataFrame:
    """Widen a point stream that is about to be broadcast-scored so
    the scored stream's PER-TASK slice stays sort/spill-friendly.

    The broadcast cross-join multiplies each input row by k model
    rows; the argmax that follows is a struct-max (SortAggregate —
    structs have no mutable hash buffer), so each task SORTS its
    whole scored slice. At cluster-width partitioning the 2 M × 178
    IMI scoring stream is ~11 M skinny rows (~440 MB of sorter
    pressure) per task × 32 concurrent — the measured 4 g executor
    death in qs25's r11 rung re-run (heap OOM inside the partial
    SortAggregate). Capping the slice at ``rows_per_task`` scored
    rows (~60 MB) makes every sorter in-memory. On a real cluster
    reading 100 TB the scan's own input splits already provide this
    width — the guard binds only when work density per input split
    is extreme (small corpus × √n-scale k in one 550 MB file), so it
    widens and never narrows; the exchange it adds is one pass over
    the SKINNY point stream, paid only when the scoring volume
    justifies it."""
    import math

    if work_rows is None:
        return df
    want = math.ceil(work_rows / rows_per_task)
    base = df.sparkSession.sparkContext.defaultParallelism
    if want <= base:
        return df
    return df.repartition(want)


def imi_assign(
    pts: DataFrame, cent1: DataFrame, cent2: DataFrame, d_half: int,
    work_rows: int | None = None,
) -> DataFrame:
    """(id, u, cid1, cid2): two-level IMI cell assignment in ONE pass.

    Both sub-quantizers' centroids are unioned into one broadcast
    table tagged ``q`` ∈ {1, 2}; each point is scored against all
    2·k_each of them in a single broadcast cross-join, and ONE
    map-side-combinable aggregation extracts both argmaxes with
    conditional struct-max (``max(when(q=1, struct(dot, -cid)))``).
    The corpus is never shuffled and never joined back to itself on
    id — the two assignments that a naive two-pass implementation
    would compute (and then re-join, two corpus shuffles) fall out of
    one O(n·2k) scored stream that collapses map-side to one row per
    point. At 100 TB this is the difference between zero corpus
    exchanges and two. ``work_rows`` (= corpus rows × 2·k_each, which
    callers already know — no counting job) lets the scored stream
    pre-widen so the struct-max SortAggregate's per-task slice stays
    bounded — see ``_widen_for_scoring``."""
    c1 = cent1.select(F.lit(1).alias("q"), "cid", "c")
    c2 = cent2.select(F.lit(2).alias("q"), "cid", "c")
    cents = c1.unionByName(c2)
    # the scored stream carries ONLY (id, q, cid, dot) — the full
    # vector and both half-slices are dropped before the aggregate
    # and u is joined back by id afterwards (the _argmax_assign r8
    # fix: a first(u) buffer made every scored row and agg buffer
    # vector-width; here the naive stream carried u AND u1 AND u2)
    halved = _widen_for_scoring(
        pts.select(
            "id",
            F.slice("u", 1, d_half).alias("u1"),
            F.slice("u", d_half + 1, d_half).alias("u2"),
        ),
        work_rows,
    )
    scored = halved.crossJoin(F.broadcast(cents)).select(
        "id",
        "q",
        "cid",
        F.when(F.col("q") == 1, _dot_pre(F.col("u1"), F.col("c")))
        .otherwise(_dot_pre(F.col("u2"), F.col("c")))
        .alias("dot"),
    )
    best = (
        scored.groupBy("id")
        .agg(
            F.max(
                F.when(
                    F.col("q") == 1,
                    F.struct(F.col("dot"), (-F.col("cid")).alias("ncid")),
                )
            ).alias("b1"),
            F.max(
                F.when(
                    F.col("q") == 2,
                    F.struct(F.col("dot"), (-F.col("cid")).alias("ncid")),
                )
            ).alias("b2"),
        )
        .select(
            "id",
            (-F.col("b1.ncid")).cast("long").alias("cid1"),
            (-F.col("b2.ncid")).cast("long").alias("cid2"),
        )
    )
    return pts.join(best, "id").select("id", "u", "cid1", "cid2")


def cosine_topk_imi(
    df: DataFrame,
    k_neighbors: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_each: int | None = None,
    n_iter: int = 2,
) -> DataFrame:
    """Two-level inverted multi-index (IMI) ANN — the next rung above
    single-level IVF (``cosine_topk_kmeans``), per Babenko &
    Lempitsky, "The Inverted Multi-Index" (CVPR 2012): the vector is
    split into two halves, each half gets its OWN k_each-cell trained
    quantizer, and the index cell is the PRODUCT (cid1, cid2) —
    k_each² cells for 2·k_each centroid scorings per vector. With
    k_each = ceil(√(n/256)) (``imi_cells_for``, the r7 search-sized
    grid) the product has ≈n/256 cells — ~256 vectors per cell, so
    the within-cell self-join stays LINEAR (~256·n candidates, the
    qs13 budget with trained cells) while assignment costs
    2·√(n/256) scorings per vector; a SINGLE-level quantizer with
    n/256 cells would pay n²/256 in assignment, and the √n-cell IVF
    pays n·√n in self-join search — the product decomposition is
    what lets cell count grow linearly with the corpus without the
    quantizer exploding (measured at the 100× replica, single-level
    full-train IVF spent 2 582 s dominated by its n·√n quantizer).

    Every stage is the deterministic machinery of qs14/qs16 —
    seeded-md5 init, fold dot products, quantized-integer means — run
    per half, so the ENTIRE two-quantizer pipeline replays in ANSI
    SQL and is hash-verified end to end (qs17). Candidates stay a
    pure equi-join on the two cell ids; ties → lowest cid per level.
    """
    from pyspark.sql import Window as W

    d_half = _half_dim(df, vec_col)
    if k_each is None:
        k_each = imi_cells_for(df.count())
    pts = _unit_vectors(df, id_col, vec_col)
    cent1, cent2 = kmeans_centroids_on_halves(
        pts, d_half, k=k_each, n_iter=n_iter
    )
    asg = imi_assign(pts, cent1, cent2, d_half).repartition("cid1", "cid2")
    a, b = asg.alias("a"), asg.alias("b")
    cos = _dot_pre(F.col("a.u"), F.col("b.u"))
    pairs = a.join(
        b,
        (F.col("a.cid1") == F.col("b.cid1"))
        & (F.col("a.cid2") == F.col("b.cid2"))
        & (F.col("a.id") != F.col("b.id")),
    ).select(
        F.col("a.cid1").alias("cid1"),
        F.col("a.cid2").alias("cid2"),
        F.col("a.id").alias("query_id"),
        F.col("b.id").alias("neighbor_id"),
        cos.alias("cosine"),
    )
    # cell-local top-k: rank within (cid1, cid2, query_id) equals the
    # global per-query rank (single probe — all candidates share the
    # query's product cell), and the join's (cid1, cid2) hash
    # partitioning satisfies the window's clustering — the ~256·n
    # candidate stream is never re-exchanged on query_id;
    # WindowGroupLimit prunes to k during the local sort.
    w = W.partitionBy("cid1", "cid2", "query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k_neighbors)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def kmeans_centroids_on_halves(
    pts: DataFrame, d_half: int, k: int, n_iter: int = 2
) -> tuple[DataFrame, DataFrame]:
    """Both IMI half-quantizers trained JOINTLY — the ``pq_codebooks``
    batching applied to the spherical trainer: one tagged
    (s, id, half-vector) stream, each Lloyd iteration ONE equi-join +
    argmax-dot + grouped renormalized positional mean over both
    halves at once. Math per half is IDENTICAL to two independent
    ``kmeans_centroids_on`` runs (the md5(id) seeded init is
    half-independent, so both halves seed from the same k vectors'
    slices; assignment within a half never sees the other half), so
    qs17's SQL oracle — which replays per-half training — stays
    valid; the job count halves (1 init + n_iter collects instead of
    2·(1 + n_iter))."""
    from pyspark import StorageLevel

    spark = pts.sparkSession
    subs = pts.select(
        "id",
        F.posexplode(
            F.array(
                F.slice("u", 1, d_half),
                F.slice("u", d_half + 1, d_half),
            )
        ).alias("s", "u"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        top = (
            pts.select(
                "id", "u", F.md5(F.col("id").cast("string")).alias("ik")
            )
            .orderBy("ik", "id")
            .limit(k)
            .collect()
        )
        rows = [
            (s, cid, list(r["u"])[s * d_half : (s + 1) * d_half])
            for s in range(2)
            for cid, r in enumerate(top)
        ]
        cent = spark.createDataFrame(
            rows, "s int, cid long, c array<double>"
        )
        for _ in range(n_iter):
            scored = subs.join(F.broadcast(cent), "s").withColumn(
                "score", _dot_pre(F.col("u"), F.col("c"))
            )
            assigned = (
                scored.groupBy("s", "id")
                .agg(
                    F.max(
                        F.struct(
                            F.col("score"), (-F.col("cid")).alias("ncid")
                        )
                    ).alias("best"),
                    F.first("u").alias("u"),
                )
                .select(
                    "s",
                    "u",
                    (-F.col("best.ncid")).cast("long").alias("cid"),
                )
            )
            means = _cell_means(assigned, ["s", "cid"])
            new_cent = means.select(
                "s",
                "cid",
                F.transform(
                    "mv",
                    lambda x: x
                    / F.sqrt(_dot_pre(F.col("mv"), F.col("mv"))),
                ).alias("c"),
            )
            rows = [
                (r["s"], r["cid"], list(r["c"]))
                for r in new_cent.collect()
            ]
            cent = spark.createDataFrame(
                rows, "s int, cid long, c array<double>"
            )
    finally:
        subs.unpersist(blocking=False)
    halves = {}
    for s_val, cid, c in rows:
        halves.setdefault(s_val, []).append((cid, c))
    c1, c2 = (
        spark.createDataFrame(sorted(halves[s]), "cid long, c array<double>")
        for s in range(2)
    )
    return c1, c2


def kmeans_l2_on(pts: DataFrame, k: int, n_iter: int = 2) -> DataFrame:
    """Plain (non-spherical) Lloyd k-means over (id, u) — the PQ
    sub-quantizer trainer: assignment by MINIMUM Euclidean distance,
    expressed as argmax of ``dot(u, c) − ‖c‖²/2`` (the ‖u‖² term is
    constant per point, so the argmin is identical — and the dot-form
    keeps every scoring a fold both engines replay bitwise), update =
    the quantized-integer positional mean WITHOUT renormalization
    (``_cell_means``'s mv directly — PQ codebook entries must
    approximate the subvector itself, magnitude included, unlike the
    unit centroids of a direction quantizer). Same determinism
    contract as ``kmeans_centroids_on``: seeded-md5 init, fixed
    iterations, ties → lowest cid."""
    spark = pts.sparkSession
    cent = _seeded_init(pts, k)
    for _ in range(n_iter):
        withcc = cent.withColumn("cc", _dot_pre(F.col("c"), F.col("c")))
        scored = pts.crossJoin(F.broadcast(withcc)).withColumn(
            "score",
            _dot_pre(F.col("u"), F.col("c")) - F.lit(0.5) * F.col("cc"),
        )
        assigned = (
            scored.groupBy("id")
            .agg(
                F.max(
                    F.struct(F.col("score"), (-F.col("cid")).alias("ncid"))
                ).alias("best"),
                F.first("u").alias("u"),
            )
            .select(
                "id", "u", (-F.col("best.ncid")).cast("long").alias("cid")
            )
        )
        means = _cell_means(assigned, "cid")
        rows = [(r["cid"], list(r["mv"])) for r in means.collect()]
        cent = spark.createDataFrame(rows, "cid long, c array<double>")
    return cent


def pq_codebooks(
    pts: DataFrame, m: int, d_sub: int, k_pq: int, n_iter: int = 2
) -> list[DataFrame]:
    """One L2-trained codebook per subvector slice, all ``m`` trained
    JOINTLY: the corpus explodes once into a tagged subvector stream
    (s, id, u_s) and each Lloyd iteration is ONE equi-join + argmax +
    grouped positional mean over every subspace at once, instead of
    ``m`` independent ``kmeans_l2_on`` loops. The math per subspace is
    IDENTICAL to the independent runs — the seeded init ranks points
    by ``md5(id)``, which does not depend on ``s``, so every subspace
    seeds from the same k vectors' slices; assignments within a
    subspace never see other subspaces (the centroid join is on
    ``s``); and the update is ``_cell_means`` grouped by (s, cid) —
    so the SQL oracles that replay per-subspace training stay valid.
    What changes is the JOB count: 1 init + n_iter collects total,
    versus m·(1 + n_iter) — measured 17 s -> ~5 s for qs18 at sf0.1,
    where fixed per-job overhead dominated. Returns m (cid, c) frames
    (local, model-sized), collected/broadcast like every quantizer
    here. Like ``kmeans_centroids_on``, the tagged stream persists
    (MEMORY_AND_DISK) across the loop's collect jobs."""
    from pyspark import StorageLevel

    spark = pts.sparkSession
    subs = pts.select(
        "id",
        F.posexplode(
            F.array(
                *[F.slice("u", s * d_sub + 1, d_sub) for s in range(m)]
            )
        ).alias("s", "u"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # seeded init: the same k md5(id)-ranked points seed every
        # subspace (one TakeOrdered job; slices taken driver-side)
        top = (
            pts.select(
                "id", "u", F.md5(F.col("id").cast("string")).alias("ik")
            )
            .orderBy("ik", "id")
            .limit(k_pq)
            .collect()
        )
        cent_rows = [
            (s, cid, list(r["u"])[s * d_sub : (s + 1) * d_sub])
            for s in range(m)
            for cid, r in enumerate(top)
        ]
        cent = spark.createDataFrame(
            cent_rows, "s int, cid long, c array<double>"
        )
        rows = cent_rows  # n_iter=0 returns the seeded codebooks
        for _ in range(n_iter):
            withcc = cent.withColumn(
                "cc", _dot_pre(F.col("c"), F.col("c"))
            )
            scored = subs.join(F.broadcast(withcc), "s").withColumn(
                "score",
                _dot_pre(F.col("u"), F.col("c"))
                - F.lit(0.5) * F.col("cc"),
            )
            assigned = (
                scored.groupBy("s", "id")
                .agg(
                    F.max(
                        F.struct(
                            F.col("score"), (-F.col("cid")).alias("ncid")
                        )
                    ).alias("best"),
                    F.first("u").alias("u"),
                )
                .select(
                    "s",
                    "u",
                    (-F.col("best.ncid")).cast("long").alias("cid"),
                )
            )
            means = _cell_means(assigned, ["s", "cid"])
            rows = [
                (r["s"], r["cid"], list(r["mv"]))
                for r in means.collect()
            ]
            cent = spark.createDataFrame(
                rows, "s int, cid long, c array<double>"
            )
    finally:
        subs.unpersist(blocking=False)
    final = {}
    for s_val, cid, c in rows:
        final.setdefault(s_val, []).append((cid, c))
    return [
        spark.createDataFrame(sorted(final[s]), "cid long, c array<double>")
        for s in range(m)
    ]


def _tagged_books(books: list[DataFrame]) -> DataFrame:
    """(q, cid, c, cc): all sub-codebooks unioned with their
    sub-quantizer index ``q`` and precomputed ‖c‖² — the broadcast
    model table every PQ stage scores against."""
    tagged = None
    for s, b in enumerate(books):
        t = b.select(
            F.lit(s).alias("q"),
            "cid",
            "c",
            _dot_pre(F.col("c"), F.col("c")).alias("cc"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    return tagged


def pq_encode(
    pts: DataFrame, books: list[DataFrame], m: int, d_sub: int,
    work_rows: int | None = None,
) -> DataFrame:
    """(id, codes: array<long>): PQ encoding — each subvector mapped
    to its nearest (L2) codebook entry, ALL ``m`` assignments in one
    broadcast-scored pass with conditional struct-max aggregation
    (the ``imi_assign`` shape generalized to m quantizers): the
    corpus is scored against the m·k tagged codebook rows, collapses
    map-side to one row per vector, and is never shuffled or
    self-joined. 64 float dims become m small ints — the compressed
    representation a 100 TB index actually stores."""
    tagged = _tagged_books(books)
    # the scored stream carries only the m half-slices — not the full
    # vector, which the codes output never uses (the r8 vector-payload
    # rule: nothing data-sized rides through an n·k aggregate); with
    # a known corpus count the stream pre-widens so the struct-max
    # SortAggregate's per-task slice stays bounded (_widen_for_scoring)
    withsubs = _widen_for_scoring(
        pts.select(
            "id",
            *[
                F.slice("u", s * d_sub + 1, d_sub).alias(f"u{s}")
                for s in range(m)
            ],
        ),
        work_rows,
    )
    score = None
    for s in range(m):
        branch = _dot_pre(F.col(f"u{s}"), F.col("c")) - F.lit(0.5) * F.col("cc")
        score = (
            F.when(F.col("q") == s, branch)
            if score is None
            else score.when(F.col("q") == s, branch)
        )
    scored = withsubs.crossJoin(F.broadcast(tagged)).withColumn("score", score)
    aggs = [
        F.max(
            F.when(
                F.col("q") == s,
                F.struct(F.col("score"), (-F.col("cid")).alias("ncid")),
            )
        ).alias(f"b{s}")
        for s in range(m)
    ]
    return (
        scored.groupBy("id")
        .agg(*aggs)
        .select(
            "id",
            F.array(
                *[(-F.col(f"b{s}.ncid")).cast("long") for s in range(m)]
            ).alias("codes"),
        )
    )


def pq_adc_topk(
    queries_pts: DataFrame,
    corpus_codes: DataFrame,
    books: list[DataFrame],
    m: int,
    d_sub: int,
    k_neighbors: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: score(q, x) = Σ_s
    dot(q_s, c[s, code_s(x)]) — the query stays full-precision, the
    corpus is m codes, per-pair cost m table lookups instead of a
    d-dim dot (Jégou, Douze & Schmid, "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011).

    Shape (r8, the qs19 memory-bounded recipe): each query folds its
    ENTIRE quantized lookup table into one broadcast
    ``array<array<long>>`` row (m sub-tables × k_pq entries — exact
    BIGINT partials, same trick as ``_cell_means``), the corpus code
    column streams through ONE broadcast join (the m-int codes, never
    the vectors, never exploded), and the per-pair ADC total is an
    inline sum UNROLLED over the m literal sub-quantizers — plain
    scalar codegen, no n·m row explode, no (sub, code) join fan-out,
    no |Q|·n-group hash aggregate (the prior shape's 2.6e8-row
    intermediate at 100×). The per-query rank<=k filter lets Spark
    infer a PARTIAL WindowGroupLimit below the exchange, so each map
    task ships only its local top-k per query. Scores are fixed-point
    rounded BEFORE ranking (engine-independent cut); ties →
    neighbor_id. Values are bitwise-identical to the explode/join
    shape: the same qt integers are summed, exactly, in any order."""
    from pyspark.sql import Window as W

    # per-query quantized lookup table as ONE projection over the
    # LITERAL codebooks (exact BIGINT partials — the per-pair Σ_s is
    # a commutative integer sum, deterministic under any order and
    # replayable in SQL); see _qt_all_literal for why there is no
    # crossJoin/groupBy assembly
    qtab = queries_pts.select(
        F.col("id").alias("query_id"),
        _qt_all_literal(books, m, d_sub).alias("qt_all"),
    )
    adc_long = sum(
        (
            F.element_at(
                F.element_at(F.col("qt_all"), s + 1),
                (F.element_at(F.col("codes"), s + 1) + F.lit(1)).cast("int"),
            )
            for s in range(m)
        ),
        F.lit(0).cast("long"),
    )
    adc = F.col("adc_l").cast("double") / F.lit(float(_QSCALE))
    rounded = F.floor(
        adc * F.lit(float(10**round_digits)) + F.lit(0.5)
    ) / F.lit(float(10**round_digits))
    w = W.partitionBy("query_id").orderBy(
        F.col("adc_r").desc(), F.col("neighbor_id")
    )
    return (
        corpus_codes.select(F.col("id").alias("neighbor_id"), "codes")
        .crossJoin(F.broadcast(qtab))
        .select("query_id", "neighbor_id", adc_long.alias("adc_l"))
        .select("query_id", "neighbor_id", rounded.alias("adc_r"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k_neighbors)
    )


def _qt_all_literal(
    books: list[DataFrame], m: int, d_sub: int, u_col: str = "u"
) -> Column:
    """Per-point quantized ADC lookup table ``qt_all[s][code]`` as ONE
    projection over literal codebooks — no crossJoin, no groupBy.

    The r8 pre-literal build crossJoined every point with the m·k_pq
    tagged codebook rows and re-assembled the table with
    ``groupBy(id).agg(sort_array(collect_list(...)))`` — measured at
    the 100× ladder point, that aggregate alone was ~600 s of
    qs19/qs27's ~870 s wall (the scored stream itself: 15 s). The
    codebooks are O(m·k_pq·d_sub) MODEL state (4·16·16 doubles here),
    so they belong in the plan as literals — the same collect-the-
    model convention as every trainer. Each entry replays the exact
    oracle arithmetic: floor(fold(slice(u) · c) · QSCALE + 0.5), with
    the same left-to-right fold over the same doubles, so every
    hash-verified consumer stays bit-identical.

    r14 construction rewrite (values unchanged): the original form
    built m·k_pq per-entry expressions, each with its own d_sub
    ``F.lit`` calls — ~1.4k py4j round-trips, measured at ~5 s of
    DRIVER time per call on a 2 ms-roundtrip box, paid per qst8
    MICRO-BATCH. Now each sub-table is ONE SQL-parsed literal
    k_pq×d_sub matrix (``F.expr`` — a single round-trip; ``repr``
    floats parse back to the identical float64, both parsers are
    correctly rounded) folded by ONE ``transform`` lambda, ~50
    round-trips total. Per entry the evaluated ops are the same
    zip_with/aggregate/floor chain over the same doubles. Dead slots
    (a sub-codebook missing a mid-range cid to an empty Lloyd
    cluster — codes that can never appear in pq_encode output) are
    all-zero vectors: the fold is exactly 0.0 and floor(0.5) = 0,
    the same long 0 the per-entry form emitted (an EMPTY array would
    be wrong — zip_with null-pads the shorter side and the fold
    would yield NULL)."""
    rows: dict[tuple[int, int], list[float]] = {}
    k_pq = 0
    for s, b in enumerate(books):
        for r in b.collect():
            rows[(s, int(r["cid"]))] = [float(x) for x in r["c"]]
            k_pq = max(k_pq, int(r["cid"]) + 1)

    def _dlit(x: float) -> str:
        # repr() is the shortest round-tripping decimal; Spark's
        # parser (Java parseDouble) is correctly rounded, so the
        # parsed double is bit-identical to the collected one
        return repr(float(x)) + "D"

    def table(s: int) -> Column:
        cells = []
        for code in range(k_pq):
            c = rows.get((s, code)) or [0.0] * d_sub
            cells.append("array(" + ",".join(_dlit(x) for x in c) + ")")
        mat = F.expr("array(" + ",".join(cells) + ")")
        return F.transform(
            mat,
            lambda c: F.floor(
                F.aggregate(
                    F.zip_with(
                        F.slice(F.col(u_col), s * d_sub + 1, d_sub),
                        c,
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda a, v: a + v,
                )
                * F.lit(float(_QSCALE))
                + F.lit(0.5)
            ).cast("long"),
        )

    return F.array(*[table(s) for s in range(m)])


def _ivfpq_gather_topk(
    qtab: DataFrame,
    cand: DataFrame,
    k_neighbors: int,
    round_digits: int,
) -> DataFrame:
    """Per-cell cogroup + int64 table-gather ADC top-k (the
    ``gather_kernel=True`` tail of ``cosine_topk_ivfpq``; see that
    docstring for why this is bit-identical to the declarative
    shape). One Arrow exchange per side keyed on the coarse cell;
    inside each cell the kernel gathers ``scores[q, c] = Σ_s
    QT[q, s, codes[c, s]]`` as NumPy int64 (exact — order-free),
    applies the same IEEE double rounding, and emits the per-query
    top-k with the (adc desc, neighbor_id asc) tie-break, splitting
    value ties by neighbor_id BEFORE the cut so the boundary matches
    row_number semantics. Queries are chunked so the score matrix
    stays ≤ ~64 MB per block regardless of cell size."""
    import numpy as np
    import pandas as pd

    qscale = float(_QSCALE)
    rd = float(10**round_digits)
    k = k_neighbors

    def _score(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "neighbor_id": pd.Series(dtype="int64"),
                "adc_r": pd.Series(dtype="float64"),
                "rank": pd.Series(dtype="int64"),
            }
        )
        if len(left) == 0 or len(right) == 0:
            return empty
        q_ids = left["query_id"].to_numpy(dtype="int64")
        QT = np.stack(
            [
                np.stack([np.asarray(t, dtype="int64") for t in row])
                for row in left["qt_all"]
            ]
        )  # (nq, m, k_pq)
        n_ids = right["neighbor_id"].to_numpy(dtype="int64")
        CD = np.stack(
            [np.asarray(c, dtype="int64") for c in right["codes"]]
        )  # (nc, m)
        nc, m = CD.shape
        parts = []
        block = max(1, (1 << 23) // nc)  # ≤ 64 MB of int64 scores
        for lo in range(0, len(q_ids), block):
            hi = min(lo + block, len(q_ids))
            nb = hi - lo
            scores = QT[lo:hi, 0][:, CD[:, 0]].copy()
            for s in range(1, m):
                scores += QT[lo:hi, s][:, CD[:, s]]
            adc = np.floor(scores.astype("float64") / qscale * rd + 0.5) / rd
            adc[q_ids[lo:hi, None] == n_ids[None, :]] = -np.inf
            # fully vectorized per-row top-k with row_number tie
            # semantics: keep every entry >= the row's k-th value
            # (ties included), lexsort by (row, -adc, neighbor_id),
            # rank by position within row, cut at k — no per-query
            # Python loop (the loop was ~ms per query: the measured
            # wall at 200k queries)
            mask = np.isfinite(adc)
            if nc > k:
                kth = np.argpartition(-adc, k - 1, axis=1)[:, k - 1]
                thresh = adc[np.arange(nb), kth]
                mask &= adc >= thresh[:, None]
            ri, ci = np.nonzero(mask)
            if len(ri) == 0:
                continue
            vals = adc[ri, ci]
            nids = n_ids[ci]
            order = np.lexsort((nids, -vals, ri))
            ri, vals, nids = ri[order], vals[order], nids[order]
            starts = np.searchsorted(ri, np.arange(nb))
            ranks = np.arange(len(ri)) - starts[ri] + 1
            keep = ranks <= k
            parts.append(
                pd.DataFrame(
                    {
                        "query_id": q_ids[lo + ri[keep]],
                        "neighbor_id": nids[keep],
                        "adc_r": vals[keep],
                        "rank": ranks[keep].astype("int64"),
                    }
                )
            )
        if not parts:
            return empty
        return pd.concat(parts, ignore_index=True)

    return (
        qtab.groupby("cell")
        .cogroup(cand.groupby("cell"))
        .applyInPandas(
            _score,
            schema="query_id long, neighbor_id long, adc_r double, rank long",
        )
    )


def cosine_topk_ivfpq(
    df: DataFrame,
    k_neighbors: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = None,
    m: int = 4,
    d_sub: int = 16,
    k_pq: int = 16,
    n_iter: int = 2,
    round_digits: int = 6,
    train_df: DataFrame | None = None,
    gather_kernel: bool = False,
    cent: DataFrame | None = None,
    books: list[DataFrame] | None = None,
    asg: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF+PQ — the composed index (FAISS ``IVFx,PQy``, Jégou et al.
    2011): a TRAINED coarse quantizer bounds candidates to same-cell
    pairs (n²/k, the IVF property) and product-quantization ADC
    scores them in the COMPRESSED domain — per candidate pair, m
    table lookups instead of a d-dim dot (16× fewer flops at
    m=4, d=64), over a corpus stored as m small ints per vector.
    This is the shape a 100 TB vector corpus actually serves from:
    both the memory bound (codes, not floats) and the compute bound
    (cells × lookups) scale.

    Plan shape (r8 — the memory-bounded rewrite): each point carries
    its FULL quantized lookup table as one array<array<long>> column
    (m·k_pq longs ≈ 64 values — built by a linear n·m·k_pq-row
    aggregate that collapses map-side), the candidate pairs come
    from ONE equi-join on the coarse cell, and the per-pair ADC
    score is a zip_with/element_at fold computed INLINE on the pair
    row — no per-(query, neighbor) aggregate ever materializes. The
    previous shape joined on (cell, sub, code) and re-aggregated
    n²/k·m exploded rows (~4×10⁹ at the 100× ladder point) through a
    giant hash-agg — the measured 16 GiB heap floor (r7 verdict
    "What's wrong" #3); this one streams n²/k pair rows straight
    into the top-k window. The window partitions by (cell, query_id):
    every query's candidates live entirely in its own cell, so the
    rank is identical to a query_id window, and the cell equi-join's
    hash-partitioning already satisfies the clustering — the top-k
    adds a per-partition sort but NO further exchange. No broadcast
    of anything data-sized: codebooks (m·k_pq·d_sub) and centroids
    (k·d) are the only models shipped. This variant encodes raw
    vectors, not residuals — residual encoding needs a per-cell
    codebook train that breaks nothing here but buys little at these
    dims; documented trade, same search topology.

    The quantized per-sub integers, their sum, and the fixed-point
    rounding are bit-identical to the previous shape, so the SQL
    oracle replays unchanged — only the physical plan moved.

    ``gather_kernel=True`` (qs27) swaps the pair-join + window tail
    for a per-cell cogroup + NumPy table-gather kernel — FAISS's
    actual per-inverted-list scan. UNLIKE the float BLAS twins this
    stays HASH-VERIFIED against the same oracle: the ADC partials are
    exact int64, so their sum is accumulation-order-independent, and
    the final double rounding is the same IEEE op sequence — the
    kernel cannot change a single output bit. What it changes is the
    physical cost: no n²/k joined pair ROWS are ever materialized
    (the join output row carries the ~0.5 kB qt_all payload per pair
    — ~500 GB of row traffic at the 100× point — and the top-k sorts
    the full pair stream); the kernel gathers scores as one
    (queries × candidates) int64 matrix per cell, block-chunked to
    ~64 MB so per-task memory is flat in cell size.
    """
    from pyspark.sql import Window as W

    if n_clusters is None:
        n_clusters = trained_cells_for(df.count())
    pts = _unit_vectors(df, id_col, vec_col)
    # Both trainers (coarse quantizer AND PQ codebooks) run over
    # ``train_df`` when given — a digest sample in the production
    # shape (qs19), keeping trainer cost O(sample·k) while encoding
    # and assignment stay full-corpus. Default: train on the corpus.
    tpts = (
        _unit_vectors(train_df, id_col, vec_col)
        if train_df is not None
        else pts
    )
    # ``cent``/``books`` accept a PRE-TRAINED model (the FAISS serving
    # split: train once, search many — qs19/qs27 share one memoized
    # 'ivfpq:' model this way); when absent, train here on ``tpts``.
    if cent is None:
        cent = kmeans_centroids_on(tpts, k=n_clusters, n_iter=n_iter)
    # ``asg``/``codes`` accept PRE-COMPUTED corpus state (id, cid) /
    # (id, codes) — the store-served split (qs19b): assignment and
    # encoding happen ONCE at store build; serving injects them here
    # and pays only the cell join + ADC + top-k.
    if asg is None:
        asg = _argmax_assign(pts, cent)
    else:
        asg = pts.join(asg.withColumnRenamed("id", "_aid"),
                       F.col("id") == F.col("_aid")).select("id", "u", "cid")
    if books is None:
        books = pq_codebooks(tpts, m=m, d_sub=d_sub, k_pq=k_pq, n_iter=n_iter)
    if codes is None:
        codes = pq_encode(pts, books, m=m, d_sub=d_sub)
    # per-point quantized lookup table as ONE projection over the
    # LITERAL codebooks (qt_all[s][code], 1-based inner index) — see
    # _qt_all_literal for the measured reason there is no crossJoin
    # and no groupBy here
    qtab = asg.select(
        F.col("id").alias("query_id"),
        F.col("cid").alias("cell"),
        _qt_all_literal(books, m, d_sub).alias("qt_all"),
    )
    cand = codes.join(
        asg.select("id", F.col("cid").alias("cell")), "id"
    ).select(F.col("id").alias("neighbor_id"), "cell", "codes")
    if gather_kernel:
        return _ivfpq_gather_topk(qtab, cand, k_neighbors, round_digits)
    # one equi-join on the coarse cell; ADC is an inline sum on the
    # pair row, UNROLLED over the m literal sub-quantizers — plain
    # scalar codegen (two element_at per term), no zip_with
    # intermediate array allocated per pair on the 10⁹-row hot path
    # (measured 2.2–3× faster than the zip_with fold at 6.4e7 pairs;
    # unrolling only wins at small m — see _dot_pre's docstring)
    adc_long = sum(
        (
            F.element_at(
                F.element_at(F.col("qt_all"), s + 1),
                (F.element_at(F.col("codes"), s + 1) + F.lit(1)).cast("int"),
            )
            for s in range(m)
        ),
        F.lit(0).cast("long"),
    )
    adc = F.col("adc_l").cast("double") / F.lit(float(_QSCALE))
    rounded = F.floor(
        adc * F.lit(float(10**round_digits)) + F.lit(0.5)
    ) / F.lit(float(10**round_digits))
    # (cell, query_id) clustering is already satisfied by the join's
    # hash-partitioning on cell (query→cell is functional), so this
    # window exchanges NOTHING — per-partition sort only; rank equals
    # the query_id rank because all of a query's pairs share its cell
    w = W.partitionBy("cell", "query_id").orderBy(
        F.col("adc_r").desc(), F.col("neighbor_id")
    )
    return (
        qtab.join(cand, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("cell", "query_id", "neighbor_id", adc_long.alias("adc_l"))
        .select("cell", "query_id", "neighbor_id", rounded.alias("adc_r"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k_neighbors)
        .select("query_id", "neighbor_id", "adc_r", "rank")
    )


def _half_dim(df: DataFrame, vec_col: str) -> int:
    """Half the (static) vector dimension, from one row's array length
    — a metadata-scale peek, not a data scan (LIMIT 1). Odd dims are
    rejected loudly rather than silently dropping the last component."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    d = int(row[0]["d"]) if row else 0
    if d % 2 != 0:
        raise ValueError(f"IMI needs an even vector dim, got {d}")
    return d // 2


def cosine_topk_kmeans_blas_trained(
    df: DataFrame,
    k_neighbors: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    n_iter: int = 2,
    n_sub: int | None = None,
    quant: bool = False,
) -> DataFrame:
    """End-to-end BLAS trained ANN: a matmul trainer feeding the
    bucket-packed BLAS search — training AND search vectorized, the
    full-throughput production path.

    ``quant=False``: the ``kmeans_centroids_blas`` raw-float trainer
    — rows-only like raw-float qs8 was; the all-DataFrame qs7 is the
    exactness twin. ``quant=True`` (qs10's graduated r12 shape): the
    ``kmeans_centroids_quant_on`` trainer — every Lloyd assignment a
    QUANTIZED dgemm — then quantized dgemm corpus assignment and
    quantized-exact packed search via ``cosine_topk_kmeans_blas``:
    the ONLY fully-dgemm pipeline in the family (train + assign +
    search), and every score an integer the SQL oracle replays, so
    it is hash-verified end to end."""
    spark = df.sparkSession
    if quant:
        pts = _unit_vectors(df, id_col, vec_col)
        cent = kmeans_centroids_quant_on(pts, k=n_clusters, n_iter=n_iter)
        return cosine_topk_kmeans_blas(
            df,
            k_neighbors=k_neighbors,
            id_col=id_col,
            vec_col=vec_col,
            n_sub=n_sub,
            blas_assign=True,
            cent=cent,
            quant=True,
        )
    cent_rows = kmeans_centroids_blas(df, id_col, vec_col, k=n_clusters, n_iter=n_iter)
    cent = spark.createDataFrame(cent_rows, "cid long, c array<double>")
    asg = assign_clusters(df, cent, id_col, vec_col).select(
        "id", F.col("u").alias("v"), F.col("cid").alias("bucket")
    )
    if n_sub is None:
        est = _scan_bytes_est(df)
        n_sub = (
            max(1, math.ceil(est / n_clusters / _BLAS_BLOCK_BYTES))
            if est
            else 1
        )
    if n_sub > 1:
        asg = asg.withColumn("sub", F.pmod(F.xxhash64("id"), F.lit(n_sub)))
        packed = asg.groupBy("bucket", "sub").agg(
            F.collect_list(F.struct("id", "v")).alias("items")
        )
        combos = (
            packed.alias("a")
            .join(packed.alias("b"), F.col("a.bucket") == F.col("b.bucket"))
            .select(
                F.col("a.items").alias("q_items"),
                F.col("b.items").alias("d_items"),
            )
        )
    else:
        packed = asg.groupBy("bucket").agg(
            F.collect_list(F.struct("id", "v")).alias("items")
        )
        combos = packed.select(
            F.col("items").alias("q_items"), F.col("items").alias("d_items")
        )
    return _blas_topk_from_combos(combos, k_neighbors)


def cosine_topk_imi_multiprobe_blas(
    df: DataFrame,
    k_neighbors: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_each: int = 4,
    n_iter: int = 2,
    nprobe_each: int = 2,
    train_df: DataFrame | None = None,
    cents: tuple[DataFrame, DataFrame] | None = None,
    quant: bool = False,
    work_rows: int | None = None,
    probe_kernel: bool = True,
    raw: bool = True,
) -> DataFrame:
    """Multiprobe IMI at BLAS throughput — the last cell of the
    recall-knob × kernel matrix: qs24's 2×2 product probe grid (each
    query probes its top-``nprobe_each`` cells PER HALF, database
    vectors stay in their single assigned product cell, candidates
    ~nprobe²·256·n — still LINEAR) executed as per-cell dgemm blocks
    instead of the codegen fold. Unlike the single-probe BLAS twins
    the q/d sides of a block DIFFER: the database side of cell
    (c1, c2) is its assigned members, the query side is every point
    whose probe grid contains (c1, c2) — ``_blas_topk_from_combos``
    already handles asymmetric (q_items, d_items) blocks and merges
    the per-block partial top-k under a global per-query window (a
    query's ≤nprobe² probed cells are distinct and each database
    point lives in exactly one cell, so a pair arises in at most one
    block — the same uniqueness argument as the fold multiprobe).
    With ``quant=False`` the float dgemm accumulation differs from
    the fold at ulp level → rows-only; ``cosine_topk_imi`` multiprobe
    (qs24) is the hash-verified twin over the SAME model and probe
    grid, agreement pytest-pinned. ``quant=True`` (qs28's graduated
    r12 shape) keeps the FOLD assignment and probe rankings (already
    oracle-replayed — qs24's chain) and scores the blocks with the
    QUANTIZED-EXACT kernel, making the query hash-verified. ``cents``
    accepts the pre-trained half-quantizers (qs28 passes the memoized
    shared 'imi:' model)."""
    from pyspark import StorageLevel

    pts = _unit_vectors(df, id_col, vec_col)
    h = _half_dim(df, vec_col)
    if cents is not None:
        cent1, cent2 = cents
    else:
        tpts = (
            _unit_vectors(train_df, id_col, vec_col)
            if train_df is not None
            else pts
        )
        cent1, cent2 = kmeans_centroids_on_halves(
            tpts, h, k=k_each, n_iter=n_iter
        )
    # ONE fold-scoring chain total (r14 — the qs28 stageprof
    # attributed ~280 s of the 377.8 s rung row to THREE scoring
    # chains: imi_assign's pass plus two separate probe passes, each
    # rebuilding the scan→unit-vector map; an intermediate two-chain
    # shape still paid 2×~80 s): both halves' top-n probe lists come
    # from ONE scored pass, and the assignment is ``t[0]`` (probe
    # rank 1 — the ranking's (−dot, cid) order is identical to the
    # assignment argmax's, ``_topn_probes``' documented contract).
    # Session 4 moved that pass from the tagged-union crossJoin+fold
    # (``_topn_probe_ranks_halves`` — kept as the A/B-pinned fold
    # form, ``probe_kernel=False``) to its BIT-EXACT vectorized twin
    # (``_topn_probe_ranks_halves_blas`` — same double bits, same tie
    # order, no exchange, no ``work_rows`` sorter guard needed).
    # The per-id probe row (id + two ≤nprobe struct arrays) is
    # consumed twice (all rank combos → query side, rank-1 pair →
    # database side); a DISK_ONLY localCheckpoint pins it so neither
    # consumer re-runs the scoring. Output is bit-identical to the
    # imi_assign shape (same dots, same tie order) — the oracle and
    # the qs24 agreement pytest are unchanged.
    if probe_kernel:
        # the kernel emits u alongside the probe lists (bit-lossless
        # Arrow passthrough), so BOTH packing consumers read (id, u,
        # probes) straight off the one checkpoint — no pts join-back,
        # no second/third corpus scan + re-normalize (session 4: the
        # two join-side stages were 52 s + 43 s of the 102 s rung row)
        both = _topn_probe_ranks_halves_blas(
            df,
            cent1,
            cent2,
            h,
            nprobe_each,
            with_u=True,
            cids_only=False,
            # the kernel unit-normalizes bit-exactly itself: no JVM HOF
            # pass, float32 across the Arrow boundary (see the helper)
            raw=(id_col, vec_col),
            # raw: u passes through as the RAW float32 vector, so the
            # checkpoint and both packing exchanges carry half the
            # bytes; the scoring kernel re-normalizes bit-exactly
            emit_raw=raw,
        ).localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
        d_side = both.select(
            "id",
            "u",
            F.col("t1")[0]["cid"].alias("cid1"),
            F.col("t2")[0]["cid"].alias("cid2"),
        )
        q_side = (
            both.select("id", "u", F.explode("t1").alias("p1"), "t2")
            .select("id", "u", F.col("p1.cid").alias("cid1"), F.explode("t2").alias("p2"))
            .select("id", "u", "cid1", F.col("p2.cid").alias("cid2"))
        )
    else:
        both = _topn_probe_ranks_halves(
            pts, cent1, cent2, h, nprobe_each, work_rows=work_rows
        ).localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
        d_ids = both.select(
            "id",
            F.col("t1")[0]["cid"].alias("cid1"),
            F.col("t2")[0]["cid"].alias("cid2"),
        )
        d_side = pts.join(d_ids, "id")
        q_keys = (
            both.select("id", F.explode("t1").alias("p1"), "t2")
            .select(
                "id", F.col("p1.cid").alias("cid1"), F.explode("t2").alias("p2")
            )
            .select("id", "cid1", F.col("p2.cid").alias("cid2"))
        )
        q_side = pts.join(q_keys, "id")
    d_packed = d_side.groupBy("cid1", "cid2").agg(
        F.collect_list(F.struct(F.col("id"), F.col("u").alias("v"))).alias(
            "d_items"
        )
    )
    q_packed = q_side.groupBy("cid1", "cid2").agg(
        F.collect_list(F.struct(F.col("id"), F.col("u").alias("v"))).alias(
            "q_items"
        )
    )
    combos = q_packed.join(d_packed, ["cid1", "cid2"]).select(
        "q_items", "d_items"
    )
    return _blas_topk_from_combos(
        combos, k_neighbors, quant=quant, raw=raw and probe_kernel
    )


def cosine_topk_imi_blas(
    df: DataFrame,
    k_neighbors: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_each: int = 4,
    n_iter: int = 2,
    train_df: DataFrame | None = None,
    blas_assign: bool = False,
    cents: tuple[DataFrame, DataFrame] | None = None,
    quant: bool = False,
    raw: bool = True,
) -> DataFrame:
    """The search-sized IMI at BLAS throughput — ``cosine_topk_imi``'s
    model (same half-quantizer trainer, so with the same ``train_df``
    the product cells are IDENTICAL) searched with the bucket-packed
    Arrow/NumPy matmul kernel instead of the codegen fold: each
    product cell (~256 vectors at the search sizing) packs into one
    block that scores against itself in a single dgemm — no candidate
    join at all, the ``cosine_topk_kmeans_blas_trained`` recipe with
    the (cid1, cid2) product grid as the bucket key. The self-join
    search stays LINEAR (~256·n multiply-adds — the IMI property);
    the kernel changes the constant, exactly the qs16→qs23 move
    applied to the index family whose search term already scales.
    Float accumulation order differs from the SQL fold at ulp level,
    so this is rows-only (the qs4/qs6/qs8/qs10/qs23 convention);
    ``cosine_topk_imi`` is the hash-verified exactness twin over the
    SAME cells, agreement pinned in tests/test_similarity.py.

    ``blas_assign`` moves the Θ(n^1.5/16) half-assignment scoring —
    what dominates this operator's wall once the search is dgemm —
    into the same NumPy kernel family (the ``cosine_topk_kmeans_blas``
    recipe: O(k·d) centroid collect, per-batch ``argmax(U @ C.T)``
    per half; argmax-first ties to the lowest cid, matching
    ``imi_assign``'s (dot, -cid) struct-max at EXACT ties). Caveat
    (r9, ADVICE): dgemm accumulation order differs from the fold at
    ulp level, so when two cells' dots are within an ulp the two
    assigners can legitimately disagree — "product cells IDENTICAL
    to the fold" is a data-dependent observation (it holds on the
    test corpora, pinned in tests/test_similarity.py), not an
    arithmetic guarantee.

    ``quant=True`` (requires ``blas_assign`` — qs26's graduated r12
    shape): half-assignments AND within-cell search score QUANTIZED
    integer dots — bit-replayable by the SQL oracle under any dgemm
    accumulation order, so the query is hash-verified end to end;
    ``imi_assign``'s float fold and its oracle consumers
    (qs17/qs24/qs25) are untouched."""
    if quant and not blas_assign:
        raise ValueError(
            "quant=True requires blas_assign=True — the quantized "
            "fold twin is cosine_topk_imi (float, oracle-checked); "
            "quant exists to make the dgemm route hash-verifiable"
        )
    h = _half_dim(df, vec_col)
    pack_raw = raw and blas_assign
    if cents is not None:
        # pre-trained half-quantizers (the train-once-serve-many
        # split; qs26 passes the memoized 'imi:' model here)
        cent1, cent2 = cents
    else:
        tpts = _unit_vectors(
            train_df if train_df is not None else df, id_col, vec_col
        )
        cent1, cent2 = kmeans_centroids_on_halves(
            tpts, h, k=k_each, n_iter=n_iter
        )
    if blas_assign:
        import numpy as np

        qscale = float(_ASSIGN_QSCALE)
        r1 = sorted((r["cid"], list(r["c"])) for r in cent1.collect())
        r2 = sorted((r["cid"], list(r["c"])) for r in cent2.collect())
        C1 = np.asarray([c for _, c in r1], dtype="float64")
        cids1 = np.asarray([cid for cid, _ in r1], dtype="int64")
        C2 = np.asarray([c for _, c in r2], dtype="float64")
        cids2 = np.asarray([cid for cid, _ in r2], dtype="int64")
        if quant:
            C1 = np.floor(C1 * qscale + 0.5)
            C2 = np.floor(C2 * qscale + 0.5)
        if raw:
            # raw float32 in, raw float32 through to the packed blocks
            # (half the assignment-boundary + packing-shuffle bytes);
            # the kernel replays _unit_vectors' chain bit-exactly and
            # the search kernel re-normalizes the same way (raw=True)
            vec_t = df.schema[vec_col].dataType.simpleString()
            pts = df.repartition(
                df.sparkSession.sparkContext.defaultParallelism
            ).select(F.col(id_col).alias("id"), F.col(vec_col).alias("u"))
        else:
            vec_t = "array<double>"
            pts = _unit_vectors(df, id_col, vec_col)

        def _assign(batches):
            import numpy as _np
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                U = _np.stack(
                    [_np.asarray(u, dtype="float64") for u in pdf["u"]]
                )
                if raw:
                    # _unit_vectors' bits: sequential fold norm, then
                    # one exact division per element
                    p = U * U
                    acc = p[:, 0] + 0.0
                    for i in range(1, p.shape[1]):
                        acc = acc + p[:, i]
                    U = U / _np.sqrt(acc)[:, None]
                S = _np.floor(U * qscale + 0.5) if quant else U
                b1 = cids1[_np.argmax(S[:, :h] @ C1.T, axis=1)]
                b2 = cids2[_np.argmax(S[:, h:] @ C2.T, axis=1)]
                yield pd.DataFrame(
                    {"id": pdf["id"], "u": pdf["u"], "cid1": b1, "cid2": b2}
                )

        import pandas as pd  # noqa: F401 — worker-side dependency

        asg = pts.mapInPandas(
            _assign,
            schema=f"id long, u {vec_t}, cid1 long, cid2 long",
        )
    else:
        asg = imi_assign(_unit_vectors(df, id_col, vec_col), cent1, cent2, h)
    packed = asg.select(
        "cid1", "cid2", F.struct(F.col("id"), F.col("u").alias("v")).alias("item")
    ).groupBy("cid1", "cid2").agg(F.collect_list("item").alias("items"))
    combos = packed.select(
        F.col("items").alias("q_items"), F.col("items").alias("d_items")
    )
    return _blas_topk_from_combos(combos, k_neighbors, quant=quant, raw=pack_raw)
