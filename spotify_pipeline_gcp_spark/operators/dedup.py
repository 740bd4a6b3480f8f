"""Document deduplication operators — exact and near-dup families.

The reference's only dedup is full-row ``drop_duplicates`` and the
anti-join delta load (SURVEY §2.5 A2, §2.4 J2). A training-data
pipeline needs content dedup at 100 TB; these operators provide the
standard ladder:

- exact: hash-groupBy on a content digest (one shuffle of digests,
  never of payloads);
- n-gram Jaccard: sparse inverted-index self-join on shingles — only
  documents sharing at least one shingle ever meet, so cost tracks
  true overlap, not n²;
- MinHash + LSH banding: constant-size signatures (k digests/doc)
  and band-bucket equi-joins — the 100 TB path, where candidate
  generation is a hash join on band keys and Jaccard verification
  runs only on candidates;
- SimHash: single fingerprint per document; near-dup = small Hamming
  distance, here bucketed by exact fingerprint equality.

All hashing is md5-hex (deterministic, engine-portable), so every
operator is oracle-checkable against ANSI SQL. At production scale
swap md5 for xxhash64 (``F.xxhash64``) — same plans, cheaper CPU.

Scale notes per operator are in the docstrings; the common knobs:
shingles with document-frequency above a cap should be dropped before
the pair join (stop-shingle filtering caps inverted-list length and
is the difference between a bounded and an n² shuffle on natural
text; the testdata vocabulary is tiny so the cap is not applied in
the oracle-checked defaults).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) rows, single-space tokenization, order preserved
    by position only where a caller requests it."""
    return df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ", -1)).alias("token")
    )


def shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Built with higher-order array functions (no Python): tokenize ->
    ``transform(sequence(...))`` sliding window -> explode -> distinct.
    Documents shorter than ``n`` tokens yield no shingles.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ", -1).alias("t"),
    ).where(F.size("t") >= n)
    window_expr = (
        f"transform(sequence(0, size(t) - {n}), "
        f"i -> concat_ws(' ', {', '.join(f't[i + {k}]' for k in range(n))}))"
    )
    return (
        toks.select("doc_id", F.explode(F.expr(window_expr)).alias("shingle"))
        .dropDuplicates()
    )


def exact_dedup_groups(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Digest groups: (text_hash, keep_id = min id, n_copies).

    One shuffle of (digest, id) pairs; payload bytes never move. At
    100 TB the digest table is ~0.1% of input size.
    """
    return (
        df.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Surviving rows after exact dedup (keep lowest id per digest)."""
    keep = exact_dedup_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    _shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard.

    Inverted-index join: documents pair only through shared shingles,
    then ``|A∩B| / (|A|+|B|-|A∩B|)``. Output: (doc_a, doc_b, jaccard),
    doc_a < doc_b. The shingle join shuffles on the shingle string —
    at scale, cap shingle document-frequency first (stop-shingle
    filter) so no single inverted list dominates a partition.
    """
    sh = _shingles if _shingles is not None else shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
    _shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures: (doc_id, seed, minhash) — one row per seed.

    Hash family: lexicographic-min of ``md5(seed || ':' || shingle)``
    hex digests — k independent permutations approximated by k salted
    hashes. Constant output size per document regardless of length:
    this is what makes near-dup feasible at 100 TB (signatures table
    is ``k * 32`` bytes/doc).
    """
    sh = _shingles if _shingles is not None else shingles(df, id_col, text_col, n)
    seeds = F.explode(
        F.array(*[F.lit(i) for i in range(num_hashes)])
    ).alias("seed")
    salted = sh.select("doc_id", "shingle", seeds).select(
        "doc_id",
        "seed",
        F.md5(
            F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("shingle"))
        ).alias("salted"),
    )
    return salted.groupBy("doc_id", "seed").agg(F.min("salted").alias("minhash"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs via MinHash LSH banding + exact verification.

    Bands of ``rows_per_band`` signature rows; documents sharing any
    complete band become candidates (hash equi-join on the band key —
    no all-pairs work), then candidates are verified with true n-gram
    Jaccard. Output: (doc_a, doc_b, jaccard), doc_a < doc_b.

    With k=8, r=2 (4 bands), P(candidate) = 1-(1-j^2)^4 — ~0.99 for
    j=0.9, ~0.22 for j=0.25: high recall at the dedup-relevant end.
    """
    # the shingle set feeds signatures AND verification. Measured at
    # sf0.1: recomputing the subplan beats .cache() (cache-write
    # overhead > recompute for a cheap explode/distinct), and caching
    # inside an operator leaks storage across invocations. At much
    # larger inputs, persist this DF (and unpersist) at the CALLER,
    # where lifetime is controllable.
    sh = shingles(df, id_col, text_col, n)
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes, _shingles=sh)
    band = (
        sigs.withColumn("band", F.floor(F.col("seed") / rows_per_band))
        .groupBy("doc_id", "band")
        .agg(
            # rows_per_band fixed positions -> order-free band key
            *[
                F.min(
                    F.when(F.col("seed") % rows_per_band == r, F.col("minhash"))
                ).alias(f"mh{r}")
                for r in range(rows_per_band)
            ]
        )
    )
    a, b = band.alias("a"), band.alias("b")
    key_eq = (F.col("a.band") == F.col("b.band"))
    for r in range(rows_per_band):
        key_eq = key_eq & (F.col(f"a.mh{r}") == F.col(f"b.mh{r}"))
    candidates = (
        a.join(b, key_eq & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .dropDuplicates()
    )
    verified = ngram_jaccard_pairs(
        df, id_col, text_col, n, threshold=0.0, _shingles=sh
    )
    return (
        candidates.join(verified, ["doc_a", "doc_b"])
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 16
) -> DataFrame:
    """SimHash fingerprint per document: (doc_id, simhash).

    Bit j of the fingerprint is the sign of the token-weighted sum of
    bit j across token hashes; bit j of a token hash is the parity of
    hex digit j of its md5 (engine-portable bit extraction). Tokens
    count with multiplicity. Fingerprints of near-identical documents
    differ in few bits; exact-equal fingerprints bucket aggressive
    near-dups with a single groupBy at any scale.
    """
    toks = tokenize(df, id_col, text_col).select(
        F.col(id_col).alias("doc_id"), F.md5("token").alias("h")
    )
    expanded = toks.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
    )
    contrib = F.expr(
        "CAST((((instr('0123456789abcdef', substring(h, j + 1, 1)) - 1) % 2)"
        " * 2 - 1) AS BIGINT)"
    )
    per_bit = (
        expanded.select("doc_id", "j", contrib.alias("c"))
        .groupBy("doc_id", "j")
        .agg(F.sum("c").alias("s"))
    )
    weight = F.when(F.col("s") > 0, F.pow(F.lit(2.0), F.col("j"))).otherwise(
        F.lit(0.0)
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(weight).cast("long").alias("simhash")
    )
