"""Deduplication queries (operators/dedup.py) with DuckDB oracles.

Oracle SQL mirrors each Spark plan step-for-step in portable ANSI
constructs; hashing is md5-hex in both engines, so values match
exactly. DuckDB list indexing is 1-based and Spark's is 0-based —
the shingle windows account for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_pipeline_gcp_spark.operators.dedup import (
    dedup_components,
    exact_dedup,
    exact_dedup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from spotify_pipeline_gcp_spark.queries import register
from spotify_pipeline_gcp_spark.queries.compat import (
    SIZED_BITS_SQL,
    SIZED_BUCKET_CAP,
    table,
)

# Corpus size above which qd14 spools its pair table to parquet
# between generation and closure (splits the two memory peaks — see
# qd14's inline comment). Below it the spool is pure fixed overhead.
_SPOOL_MIN_DOCS = 100_000

# Shared oracle CTEs for word-3-shingles (1-based list indexing).
SHINGLE_CTE = """
  tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
  shingle AS (
    SELECT DISTINCT doc_id,
           unnest(list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
    FROM tok WHERE len(t) >= 3
  )
"""

JACCARD_CTE = f"""
  {SHINGLE_CTE},
  sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM shingle GROUP BY doc_id),
  common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
    FROM shingle a JOIN shingle b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ),
  jac AS (
    SELECT doc_a, doc_b,
           n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
  )
"""


JACCARD_CAPPED_CTE = f"""
  {SHINGLE_CTE},
  hot AS (SELECT shingle FROM shingle GROUP BY shingle HAVING count(*) > 4),
  kept AS (
    SELECT s.doc_id, s.shingle
    FROM shingle s ANTI JOIN hot h ON s.shingle = h.shingle
  ),
  sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM kept GROUP BY doc_id),
  common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
    FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ),
  jac AS (
    SELECT doc_a, doc_b,
           n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
  )
"""


@register(
    "qd1_dedup_exact_groups",
    oracle="""
    SELECT md5(text) AS text_hash,
           min(doc_id) AS keep_id,
           count(*)::BIGINT AS n_copies
    FROM documents GROUP BY 1
    """,
)
def qd1_dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, group view: digest -> survivor id + copy count."""
    return exact_dedup_groups(table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "qd2_dedup_exact_keep",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM documents
    WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
    """,
)
def qd2_dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, surviving rows (lowest id per content digest)."""
    return exact_dedup(table(spark, sf_dir, "documents"), "doc_id", "text").select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "qd3_ngram_jaccard_pairs",
    oracle=f"""
    WITH {JACCARD_CTE}
    SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.8
    """,
)
def qd3_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTNESS BASELINE — use qd3b_ngram_jaccard_capped at scale
    (the documented 100 TB default, COVERAGE.md): uncapped postings
    pair template cliques quadratically on adversarial corpora (a
    shingle shared by m docs emits m² candidates); qd3b's
    stop-shingle cap bounds every posting list.

    Near-dup pairs by exact word-3-gram Jaccard >= 0.8 (the testdata
    contains injected ~0.99 pairs)."""
    return ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.8
    )


@register(
    "qd4_minhash_signatures",
    oracle=f"""
    WITH {SHINGLE_CTE},
    sliced AS (
      SELECT doc_id, seed,
             substr(md5((CASE WHEN seed < 4 THEN 'a:' ELSE 'b:' END) || shingle),
                    ((seed % 4) * 8 + 1)::INT, 8) AS word
      FROM shingle CROSS JOIN (SELECT unnest(range(8)) AS seed)
    )
    SELECT doc_id, seed, min(word) AS minhash
    FROM sliced GROUP BY doc_id, seed
    """,
)
def qd4_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=8, word-3-grams) with the SLICED hash
    family: each md5 digest yields four independent 32-bit words, so
    8 hashes cost 2 md5 calls per shingle instead of 8 — the
    signature-generation CPU term drops ~4x (the same family qd5's
    band keys use; verification there is exact regardless)."""
    sigs = minhash_signatures(
        table(spark, sf_dir, "documents"), "doc_id", "text", n=3, num_hashes=8
    )
    return sigs.select("doc_id", F.col("seed").cast("long").alias("seed"), "minhash")


@register(
    "qd5_minhash_lsh_pairs",
    oracle=f"""
    WITH {JACCARD_CTE},
    sigs AS (
      SELECT doc_id, seed,
             min(substr(md5((CASE WHEN seed < 4 THEN 'a:' ELSE 'b:' END) || shingle),
                        ((seed % 4) * 8 + 1)::INT, 8)) AS minhash
      FROM shingle CROSS JOIN (SELECT unnest(range(8)) AS seed)
      GROUP BY doc_id, seed
    ),
    bands AS (
      SELECT doc_id, seed // 2 AS band,
             min(CASE WHEN seed % 2 = 0 THEN minhash END) AS mh0,
             min(CASE WHEN seed % 2 = 1 THEN minhash END) AS mh1
      FROM sigs GROUP BY doc_id, band
    ),
    candidates AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.mh0 = b.mh0 AND a.mh1 = b.mh1
                   AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b, j.jaccard
    FROM candidates c JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
    WHERE j.jaccard >= 0.8
    """,
)
def qd5_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate generation (4 bands x 2 rows) + exact
    Jaccard verification — the 100 TB near-dup path."""
    return minhash_lsh_pairs(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        num_hashes=8,
        rows_per_band=2,
        threshold=0.8,
    )


@register(
    "qd6_simhash",
    oracle="""
    WITH tok AS (
      SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h FROM documents
    ),
    expanded AS (
      SELECT doc_id, h, unnest(range(16)) AS j FROM tok
    ),
    per_bit AS (
      SELECT doc_id, j,
             sum((((strpos('0123456789abcdef', substr(h, (j + 1)::INT, 1)) - 1) % 2)
                  * 2 - 1)::BIGINT) AS s
      FROM expanded GROUP BY doc_id, j
    )
    SELECT doc_id,
           sum(CASE WHEN s > 0 THEN power(2.0, j) ELSE 0.0 END)::BIGINT AS simhash
    FROM per_bit GROUP BY doc_id
    """,
)
def qd6_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprints (md5-hex-digit-parity bit family)."""
    return simhash(table(spark, sf_dir, "documents"), "doc_id", "text", bits=16)


@register(
    "qd7_embedding_near_dup",
    oracle="""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           floor((list_dot_product(a.v, b.v) / (a.norm * b.norm)) * 1000000 + 0.5) / 1000000
             AS cosine_r
    FROM base a JOIN base b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.norm * b.norm) >= 0.45
    """,
)
def qd7_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= 0.45).

    The semantic-dedup path: exact pairwise kernel here (oracle-
    checkable); at scale the same predicate runs after sign-bucket /
    IVF candidate generation (qs3) so the pair space is pruned before
    any dot product. Threshold 0.45 sits just under this dataset's
    max off-diagonal cosine (~0.51) so real pairs surface.
    """
    from spotify_pipeline_gcp_spark.operators.similarity import cosine_pairs
    from spotify_pipeline_gcp_spark.queries.compat import fixed

    emb = table(spark, sf_dir, "embeddings")
    pairs = cosine_pairs(emb, "vec_id", "embedding")
    return pairs.where(F.col("cosine") >= 0.45).select(
        "id_a", "id_b", fixed(F.col("cosine"), 6).alias("cosine_r")
    )


@register(
    "qd8_dedup_components",
    oracle=f"""
    WITH RECURSIVE {JACCARD_CAPPED_CTE},
    np AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.8),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM np
      UNION ALL SELECT doc_b, doc_a FROM np
    ),
    walk(node, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
    )
    SELECT node AS doc_id, min(label) AS component
    FROM walk GROUP BY node
    """,
)
def qd8_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the near-dup relation: one component id
    (min doc id) per clustered document — the keep-one-per-cluster
    dedup policy. Iterative min-label propagation in Spark; the
    oracle replays it as a recursive label-walk CTE. As of r9 the
    pair generation is the CAPPED generator (``max_shingle_df=4``,
    qd3b's production shape — the oracle replays the capped chain):
    the uncapped posting lists put the pair-aggregate at the edge of
    a 4 g heap at the 100× ladder point, exactly the hazard the
    qd3→qd3b demotion documents; the closure itself is
    generator-agnostic."""
    pairs = ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        threshold=0.8,
        max_shingle_df=4,
    )
    return dedup_components(pairs)


@register(
    "qd3b_ngram_jaccard_capped",
    oracle=f"""
    WITH {SHINGLE_CTE},
    hot AS (SELECT shingle FROM shingle GROUP BY shingle HAVING count(*) > 4),
    kept AS (
      SELECT s.doc_id, s.shingle
      FROM shingle s ANTI JOIN hot h ON s.shingle = h.shingle
    ),
    sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM kept GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
      FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) >= 0.8
    """,
)
def qd3b_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stop-shingle-capped Jaccard pairs (``max_shingle_df=4``): the
    scale knob that bounds every inverted list before the pair join —
    on natural text the difference between a bounded shuffle and a
    hot-key n² blowup. Jaccard is over the FILTERED shingle space
    (standard: stop-shingles carry no dedup signal); at this corpus
    the cap drops ~150 high-df shingles and the planted near-dup
    pairs all survive, so the capped and uncapped answers agree —
    proven here by the driver, not assumed."""
    return ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        threshold=0.8,
        max_shingle_df=4,
    )


@register(
    "qd9_simhash_pairs",
    oracle="""
    WITH tok AS (
      SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h FROM documents
    ),
    expanded AS (
      SELECT doc_id, h, unnest(range(32)) AS j FROM tok
    ),
    per_bit AS (
      SELECT doc_id, j,
             sum((((strpos('0123456789abcdef', substr(h, (j + 1)::INT, 1)) - 1) % 2)
                  * 2 - 1)::BIGINT) AS s
      FROM expanded GROUP BY doc_id, j
    ),
    fp AS (
      SELECT doc_id,
             sum(CASE WHEN s > 0 THEN power(2.0, j) ELSE 0.0 END)::BIGINT AS simhash
      FROM per_bit GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, simhash, band, (simhash >> (band * 8)::INT) & 255 AS bv
      FROM fp CROSS JOIN (SELECT unnest(range(4)) AS band)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.simhash AS fp_a, b.simhash AS fp_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(fp_a, fp_b))::BIGINT AS hamming
    FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= 3
    """,
)
def qd9_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTNESS BASELINE — use qd9b_simhash_pairs_capped at scale
    (the documented 100 TB default, COVERAGE.md): an uncapped band
    bucket holding m near-identical fingerprints (template cliques)
    emits m² candidates here; qd9b caps each band bucket (the
    fingerprint-level stop-shingle move).

    SimHash near-dup PAIRS — bit-band LSH over 32-bit fingerprints
    (4 bands x 8 bits), Hamming <= 3 verification via
    ``bit_count(a ^ b)``. With 4 bands the band filter is LOSSLESS
    for Hamming <= 3 (pigeonhole: 3 flipped bits leave one band
    intact), so this is exact near-dup pairing, not approximate —
    the operator SimHash fingerprints were missing (fingerprints
    alone only bucket EXACT fingerprint equality)."""
    return simhash_pairs(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        bits=32,
        bands=4,
        max_hamming=3,
    )


# Sign-bucket base the qd7b/qd10 oracles share: AUTO-SIZED bits
# (compat.SIZED_BITS_SQL — the sign_bits_for replay qs13 pioneered),
# then the same width-j coarse code qs13's oracle builds, then the
# HOT-BUCKET CAP (compat.SIZED_BUCKET_CAP — sign bits are
# data-correlated, so a dense region can hold one bucket at a
# constant fraction of n however many bits are added; the cap bounds
# worst-case candidates at cap*n/2, and never binds at driver scale).
# r9's 100x ladder caught the previous pinned-4-bit form quadratic:
# 16 buckets over 200k vectors is ~1.25e9 exact cosines (the sweep
# stalled >14 min on it); auto-sized buckets hold ~256 vectors at any
# scale so TYPICAL candidates stay ~256*n, and the cap makes the
# worst case linear too.
_SIGNED_BASE_SQL = f"""
    nb AS (
      SELECT {SIZED_BITS_SQL} AS bits FROM embeddings
    ),
    coded AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm,
             CAST(list_sum(list_transform(range(1, (SELECT bits FROM nb) + 1),
                  j -> CASE WHEN embedding[j] > 0 THEN 1 << (j - 1) ELSE 0 END))
                  AS BIGINT) AS bucket
      FROM embeddings
    ),
    hot AS (
      SELECT bucket FROM coded GROUP BY bucket
      HAVING count(*) > {SIZED_BUCKET_CAP}
    ),
    base AS (
      SELECT c.* FROM coded c ANTI JOIN hot h ON c.bucket = h.bucket
    )"""


def _sign_bucket_pairs(spark: SparkSession, sf_dir: str):
    """Shared qd7b/qd10 candidate stage: auto-sized sign buckets
    (operators/similarity.py::sign_bits_for — avg bucket ~256 vectors
    at any scale), hot buckets dropped (MAX_SIGN_BUCKET — worst-case
    candidate volume capped at cap*n/2), equi-join within bucket,
    exact cosine. Returns (aliased pair DataFrame, pre-threshold
    cosine column)."""
    from spotify_pipeline_gcp_spark.operators.similarity import (
        _dot_pre,
        _double_base,
        drop_hot_buckets,
        sign_bits_for,
        sign_bucket,
    )

    emb = table(spark, sf_dir, "embeddings")
    n_bits = sign_bits_for(emb.count())
    base = drop_hot_buckets(
        _double_base(emb, "vec_id", "embedding").withColumn(
            "bucket", sign_bucket("v", n_bits)
        )
    )
    a, b = base.alias("a"), base.alias("b")
    cos = _dot_pre(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
    )
    return pairs, cos


@register(
    "qd7b_embedding_near_dup_pruned",
    oracle=f"""
    WITH {_SIGNED_BASE_SQL}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           floor((list_dot_product(a.v, b.v) / (a.norm * b.norm)) * 1000000 + 0.5) / 1000000
             AS cosine_r
    FROM base a JOIN base b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.norm * b.norm) >= 0.45
    """,
)
def qd7b_embedding_near_dup_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs AT SCALE: sign-bucket candidate
    generation (qs13's AUTO-SIZED coarse code — an equi-join, never
    all-pairs, avg bucket ~256 vectors at any corpus size) feeding
    qd7's cosine >= tau predicate. This is the actual 100 TB
    semantic-dedup operator: the pair space shrinks ~2^n_bits before
    any dot product runs, and the oracle replays sizing + bucket +
    threshold (compat.SIZED_BITS_SQL) so the data-adaptive index is
    hash-verified. qd7 is the unpruned exactness twin; recall loss vs
    qd7 is the standard single-probe ANN trade (cross-bucket pairs
    are not scored)."""
    from spotify_pipeline_gcp_spark.queries.compat import fixed

    pairs, cos = _sign_bucket_pairs(spark, sf_dir)
    return pairs.where(cos >= 0.45).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        fixed(cos, 6).alias("cosine_r"),
    )


from spotify_pipeline_gcp_spark.operators.similarity import _ASSIGN_QSCALE

_QA = float(_ASSIGN_QSCALE)  # one source of truth for the fixed-point scale

# Quantized-unit-vector extension of the sign-bucket base: the same
# auto-sized buckets + hot-bucket cap, then each survivor's JVM-fold
# unit vector rounded at _ASSIGN_QSCALE — the replay of exactly what
# sign_bucket_pairs_blas's NumPy kernel scores (see qs4: integer dots
# of 2^20-rounded unit vectors are exact in float64 under any
# accumulation order, and qdot / 2^40 is a dyadic rational both
# engines represent bit-identically).
_QUANT_BASE_SQL = f"""{_SIGNED_BASE_SQL},
    qb AS (
      SELECT vec_id, bucket,
             list_transform(v, x -> floor((x / norm) * {_QA} + 0.5)) AS qu
      FROM base
    )"""


@register(
    "qd7c_embedding_near_dup_blas",
    # HASH-VERIFIED: quantized-exact pair scoring — the oracle
    # replays the kernel's integer dots bit-for-bit (qs4 discipline).
    oracle=f"""
    WITH {_QUANT_BASE_SQL}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_dot_product(a.qu, b.qu) / {_QA * _QA} AS cosine_q
    FROM qb a JOIN qb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.qu, b.qu) / {_QA * _QA} >= 0.45
    """,
)
def qd7c_embedding_near_dup_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """qd7b's throughput twin: same sign-bucket candidate space
    (auto-sized code, hot-bucket cap), but each bucket is scored as
    ONE integer dgemm instead of an equi-join of interpreted HOF
    folds — at the 5 M-doc rung 177 s of qd7b's 199 s was fold dots
    (NOTES_r13), and this kernel moves those FLOPs to BLAS while
    keeping the query hash-verifiable (quantized-exact scoring, the
    qs4/qs26 discipline — see operators/similarity.py::
    sign_bucket_pairs_blas). qd7b is retained as the raw-float fold
    anchor; the two differ only for pairs within ~2^-20 of the 0.45
    threshold, identically replayed by each query's own oracle."""
    from spotify_pipeline_gcp_spark.operators.similarity import (
        sign_bucket_pairs_blas,
    )

    emb = table(spark, sf_dir, "embeddings")
    return sign_bucket_pairs_blas(emb, threshold=0.45)


@register(
    "qd10_semantic_dedup_components",
    oracle=f"""
    WITH RECURSIVE {_QUANT_BASE_SQL},
    np AS (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
      FROM qb a JOIN qb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.qu, b.qu) / {_QA * _QA} >= 0.45
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM np
      UNION ALL SELECT doc_b, doc_a FROM np
    ),
    walk(node, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
    )
    SELECT node AS vec_id, min(label) AS component
    FROM walk GROUP BY node
    """,
)
def qd10_semantic_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup END-TO-END at the scale shape: sign-bucket
    candidate pruning (equi-join, never all-pairs) -> exact cosine
    >= 0.45 threshold (qd7b) -> transitive closure into keep-one
    clusters (qd8's min-label propagation). This is the full
    embedding-dedup policy a 100 TB pipeline runs: every stage is a
    bucketed join or an iterate-materialize loop, and the oracle
    replays sizing + pruning + threshold + closure (recursive CTE)
    exactly — buckets are AUTO-SIZED via sign_bits_for (avg ~256
    vectors each) so the candidate stage stays ~256*n at any scale.

    r14: the edge kernel is the quantized-exact per-bucket dgemm
    (qd7c — one matmul per bucket instead of the fold-scored
    equi-join that dominated the 331.6 s r13 rung row); the oracle's
    np CTE replays the quantized dots, so the threshold cut stays
    hash-verified. qd7b remains the raw-float fold anchor."""
    from spotify_pipeline_gcp_spark.operators.similarity import (
        sign_bucket_pairs_blas,
    )

    emb = table(spark, sf_dir, "embeddings")
    edges = sign_bucket_pairs_blas(emb, threshold=0.45).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    comp = dedup_components(edges)
    return comp.select(F.col("doc_id").alias("vec_id"), "component")


NEW_SRC = "('src15', 'src16', 'src17', 'src18', 'src19')"


# shared with qst5 (queries/streaming.py): the streaming foreachBatch
# near-dup drained under AvailableNow equals this batch computation.
QD11_ORACLE = f"""
    WITH old_docs AS (SELECT * FROM documents WHERE source NOT IN {NEW_SRC}),
    new_docs AS (SELECT * FROM documents WHERE source IN {NEW_SRC}),
    tok_o AS (SELECT doc_id, string_split(text, ' ') AS t FROM old_docs),
    sh_o AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM tok_o WHERE len(t) >= 3
    ),
    tok_n AS (SELECT doc_id, string_split(text, ' ') AS t FROM new_docs),
    sh_n AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM tok_n WHERE len(t) >= 3
    ),
    sig_o AS (
      SELECT doc_id, seed,
             min(substr(md5((CASE WHEN seed < 4 THEN 'a:' ELSE 'b:' END) || shingle),
                        ((seed % 4) * 8 + 1)::INT, 8)) AS minhash
      FROM sh_o CROSS JOIN (SELECT unnest(range(8)) AS seed)
      GROUP BY doc_id, seed
    ),
    sig_n AS (
      SELECT doc_id, seed,
             min(substr(md5((CASE WHEN seed < 4 THEN 'a:' ELSE 'b:' END) || shingle),
                        ((seed % 4) * 8 + 1)::INT, 8)) AS minhash
      FROM sh_n CROSS JOIN (SELECT unnest(range(8)) AS seed)
      GROUP BY doc_id, seed
    ),
    band_o AS (
      SELECT doc_id, seed // 2 AS band,
             min(CASE WHEN seed % 2 = 0 THEN minhash END) AS mh0,
             min(CASE WHEN seed % 2 = 1 THEN minhash END) AS mh1
      FROM sig_o GROUP BY doc_id, band
    ),
    band_n AS (
      SELECT doc_id, seed // 2 AS band,
             min(CASE WHEN seed % 2 = 0 THEN minhash END) AS mh0,
             min(CASE WHEN seed % 2 = 1 THEN minhash END) AS mh1
      FROM sig_n GROUP BY doc_id, band
    ),
    cand AS (
      SELECT DISTINCT o.doc_id AS doc_old, nw.doc_id AS doc_new
      FROM band_o o
      JOIN band_n nw ON o.band = nw.band AND o.mh0 = nw.mh0 AND o.mh1 = nw.mh1
    ),
    sizes_o AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh_o GROUP BY doc_id),
    sizes_n AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh_n GROUP BY doc_id),
    common AS (
      SELECT c.doc_old, c.doc_new, count(*)::BIGINT AS n_common
      FROM cand c
      JOIN sh_o a ON a.doc_id = c.doc_old
      JOIN sh_n b ON b.doc_id = c.doc_new AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT c.doc_old, c.doc_new,
           n_common::DOUBLE / (so.n_sh + sn.n_sh - n_common) AS jaccard
    FROM common c
    JOIN sizes_o so ON so.doc_id = c.doc_old
    JOIN sizes_n sn ON sn.doc_id = c.doc_new
    WHERE n_common::DOUBLE / (so.n_sh + sn.n_sh - n_common) >= 0.8
    """


@register("qd11_incremental_near_dup", oracle=QD11_ORACLE)
def qd11_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup: a new batch (sources src15-src19, the
    stand-in for today's partitions) LSH-matched against the existing
    corpus — old x new band joins only, never a corpus re-pairing.
    The reference's anti-join delta semantic lifted from exact keys
    to near-duplicates; per-batch cost is O(|new| + matched buckets)
    because the old side contributes only its (storable) band table
    and shingle sets."""
    from spotify_pipeline_gcp_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
    )

    docs = table(spark, sf_dir, "documents")
    new_srcs = ["src15", "src16", "src17", "src18", "src19"]
    return minhash_lsh_pairs_incremental(
        docs.where(~F.col("source").isin(new_srcs)),
        docs.where(F.col("source").isin(new_srcs)),
        "doc_id",
        "text",
        n=3,
        num_hashes=8,
        rows_per_band=2,
        threshold=0.8,
    )


@register(
    "qd12_keep_best_per_cluster",
    oracle=f"""
    WITH RECURSIVE {JACCARD_CAPPED_CTE},
    np AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.8),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM np
      UNION ALL SELECT doc_b, doc_a FROM np
    ),
    walk(node, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
    ),
    comp AS (SELECT node AS doc_id, min(label) AS component FROM walk GROUP BY node),
    feats AS (
      SELECT doc_id,
             length(text)::BIGINT AS n_chars_calc,
             len(string_split(text, ' '))::BIGINT AS n_tokens,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ('the','a','of','and','to','in','is','it')))::BIGINT AS stop_hits,
             length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT AS digit_chars,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::BIGINT AS punct_chars
      FROM documents
    ),
    q AS (
      SELECT doc_id,
             floor((least(n_tokens / 100.0, 1.0) * 0.4
                    + (stop_hits / n_tokens) * 0.3
                    + (1.0 - digit_chars / n_chars_calc) * 0.2
                    + (1.0 - punct_chars / n_chars_calc) * 0.1) * 1000000 + 0.5)
               / 1000000 AS q_r
      FROM feats
    ),
    ranked AS (
      SELECT c.component, c.doc_id, q.q_r,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY q.q_r DESC, c.doc_id) AS rn,
             count(*) OVER (PARTITION BY c.component) AS n_members
      FROM comp c JOIN q ON q.doc_id = c.doc_id
    )
    SELECT component, doc_id AS keep_id, n_members::BIGINT AS n_members,
           q_r AS best_score
    FROM ranked WHERE rn = 1
    """,
)
def qd12_keep_best_per_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup POLICY end-to-end: near-dup pairs -> transitive
    closure -> keep the highest-QUALITY member per cluster (ties ->
    lowest id), not the arbitrary lowest-id member. Scores come from
    the quality operator (fixed-point rounded so the argmax is
    engine-reproducible); the oracle replays closure + scoring +
    per-cluster ranking."""
    from spotify_pipeline_gcp_spark.operators.dedup import keep_best_per_cluster
    from spotify_pipeline_gcp_spark.operators.text import quality_score
    from spotify_pipeline_gcp_spark.queries.compat import fixed

    docs = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8, max_shingle_df=4
    )
    comp = dedup_components(pairs)
    scores = quality_score(docs, "doc_id", "text").select(
        "doc_id", fixed(F.col("quality"), 6).alias("q_r")
    )
    return keep_best_per_cluster(comp, scores, "doc_id", "q_r").select(
        "component", "keep_id", "n_members",
        F.col("best_score"),
    )


@register(
    "qd9b_simhash_pairs_capped",
    oracle="""
    WITH sizen AS (SELECT count(*)::BIGINT AS n FROM documents),
    sizew AS (
      SELECT least(15, greatest(8,
               CAST(ceil(log2(greatest(1, n // 4))) AS BIGINT))) AS w
      FROM sizen
    ),
    tok0 AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tok AS (
      SELECT doc_id, md5(token) AS h, md5('b:' || token) AS h2 FROM tok0
    ),
    expanded AS (
      SELECT * FROM (SELECT doc_id, h, h2, unnest(range(60)) AS j FROM tok)
      WHERE j < 4 * (SELECT w FROM sizew)
    ),
    per_bit AS (
      SELECT doc_id, j,
             sum((((strpos('0123456789abcdef',
                           substr(CASE WHEN j < 32 THEN h ELSE h2 END,
                                  (CASE WHEN j < 32 THEN j ELSE j - 32 END
                                   + 1)::INT, 1)) - 1) % 2)
                  * 2 - 1)::BIGINT) AS s
      FROM expanded GROUP BY doc_id, j
    ),
    fp AS (
      SELECT doc_id,
             sum(CASE WHEN s > 0 THEN (1::BIGINT << j::INT) ELSE 0 END)
               ::BIGINT AS simhash
      FROM per_bit GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, simhash, band,
             (simhash >> (band * (SELECT w FROM sizew))::INT)
               & ((1::BIGINT << (SELECT w FROM sizew)::INT) - 1) AS bv
      FROM fp CROSS JOIN (SELECT unnest(range(4)) AS band)
    ),
    hot AS (
      SELECT band, bv FROM banded GROUP BY band, bv HAVING count(*) > 32
    ),
    kept AS (
      SELECT b.doc_id, b.simhash, b.band, b.bv
      FROM banded b ANTI JOIN hot h ON b.band = h.band AND b.bv = h.bv
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS fp_a, b.simhash AS fp_b
      FROM kept a
      JOIN kept b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT DISTINCT doc_a, doc_b, bit_count(xor(fp_a, fp_b))::BIGINT AS hamming
    FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= 3
    """,
)
def qd9b_simhash_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash pairing with ADAPTIVE width and BOUNDED band buckets —
    the 100 TB default. Width: ``simhash_bits_for(count)`` picks the
    band width so a typical (band, value) bucket holds ~4 documents
    (candidates stay LINEAR in the corpus; a fixed width goes
    quadratic and, worse, inverts the bucket cap into zero recall
    once typical buckets exceed it — r9 measured the previous fixed
    32-bit form returning 0 pairs at the 100× ladder point, every
    8-bit band value holding ~195 > 32 docs). Cap: ``max_bucket=32``
    now only drops buckets ~8× hotter than typical — template
    cliques, the thing it was for. Both the sizing arithmetic and
    the salted second hash for bits ≥ 32 are replayed in the oracle,
    so the adaptive fingerprint is hash-verified; at driver scale
    (n=500 → 32 bits) values equal the previous fixed form.

    Deliberate semantic note: Hamming ≤ 3 at width w(n) is a
    similarity threshold that TIGHTENS as the corpus grows (3 of 60
    bits is a stricter cut than 3 of 32) — the price of linear
    candidates at a fixed band count. Workloads needing a
    scale-stable threshold should pin ``bits`` explicitly (qd9 is
    the fixed-width exactness baseline) or raise ``max_hamming``
    with ``bands = max_hamming + 1`` to keep the lossless radius."""
    from spotify_pipeline_gcp_spark.operators.dedup import simhash_bits_for

    docs = table(spark, sf_dir, "documents")
    n = docs.count()
    return simhash_pairs(
        docs,
        "doc_id",
        "text",
        bits=simhash_bits_for(n),
        bands=4,
        max_hamming=3,
        max_bucket=32,
        # bounds per-task fingerprint-aggregate state (the r10 1000x
        # ladder OOM'd the unsized form in 4 g) — see simhash()
        n_docs=n,
    )


@register(
    "qd9c_simhash_pairs_collapsed",
    oracle="""
    WITH sizen AS (SELECT count(*)::BIGINT AS n FROM documents),
    sizew AS (
      SELECT least(15, greatest(8,
               CAST(ceil(log2(greatest(1, n // 4))) AS BIGINT))) AS w
      FROM sizen
    ),
    tok0 AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tok AS (
      SELECT doc_id, md5(token) AS h, md5('b:' || token) AS h2 FROM tok0
    ),
    expanded AS (
      SELECT * FROM (SELECT doc_id, h, h2, unnest(range(60)) AS j FROM tok)
      WHERE j < 4 * (SELECT w FROM sizew)
    ),
    per_bit AS (
      SELECT doc_id, j,
             sum((((strpos('0123456789abcdef',
                           substr(CASE WHEN j < 32 THEN h ELSE h2 END,
                                  (CASE WHEN j < 32 THEN j ELSE j - 32 END
                                   + 1)::INT, 1)) - 1) % 2)
                  * 2 - 1)::BIGINT) AS s
      FROM expanded GROUP BY doc_id, j
    ),
    fp AS (
      SELECT doc_id,
             sum(CASE WHEN s > 0 THEN (1::BIGINT << j::INT) ELSE 0 END)
               ::BIGINT AS simhash
      FROM per_bit GROUP BY doc_id
    ),
    fpc AS (
      SELECT min(doc_id) AS doc_id, simhash FROM fp GROUP BY simhash
    ),
    banded AS (
      SELECT doc_id, simhash, band,
             (simhash >> (band * (SELECT w FROM sizew))::INT)
               & ((1::BIGINT << (SELECT w FROM sizew)::INT) - 1) AS bv
      FROM fpc CROSS JOIN (SELECT unnest(range(4)) AS band)
    ),
    hot AS (
      SELECT band, bv FROM banded GROUP BY band, bv HAVING count(*) > 32
    ),
    kept AS (
      SELECT b.doc_id, b.simhash, b.band, b.bv
      FROM banded b ANTI JOIN hot h ON b.band = h.band AND b.bv = h.bv
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS fp_a, b.simhash AS fp_b
      FROM kept a
      JOIN kept b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT DISTINCT doc_a, doc_b, bit_count(xor(fp_a, fp_b))::BIGINT AS hamming
    FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= 3
    """,
)
def qd9c_simhash_pairs_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """qd9b with ``collapse_identical=True`` — built as the
    hypothesized mitigation for the recall cost qd9r measured (0.58
    avg at sf0.1 under cap 32), then AUDITED: qd9r2 reports 0.584 vs
    qd9r's 0.585 on the same universe — on this corpus collapsing
    does NOT recover the capped recall, because the hot band values
    are populated by NEAR-identical (distinct) fingerprints, which
    collapse cannot merge. The honest value of the collapse is
    candidate-VOLUME control, not recall: an identical-fingerprint
    clique of c members emits c·(c-1)/2 pairs on one band reducer in
    qd9b (a blowup no bucket cap can see when the clique spans many
    buckets' worth of one value); here each clique is one
    representative and intra-clique pairs are exact-dup territory
    recovered upstream (qd1/qd2). Recall levers that DO move the
    qd9r number are cap size, band count, and pinned width. The
    collapse, sizing, cap, and Hamming verify are all
    oracle-replayed."""
    from spotify_pipeline_gcp_spark.operators.dedup import simhash_bits_for

    docs = table(spark, sf_dir, "documents")
    n = docs.count()
    return simhash_pairs(
        docs,
        "doc_id",
        "text",
        bits=simhash_bits_for(n),
        bands=4,
        max_hamming=3,
        max_bucket=32,
        collapse_identical=True,
        n_docs=n,
    )


# digest_unit replay over a `_d` column (queries/sampling.py keeps
# the canonical copy; inlined here to keep module import order —
# hence pre-window registration order — unchanged)
_UNIT_FOLD_D = " + ".join(
    f"(strpos('0123456789abcdef', substring(_d, {j + 1}, 1)) - 1)"
    f" * {16 ** (7 - j)}::BIGINT"
    for j in range(8)
)


def _simhash_audit_oracle(collapse: bool) -> str:
    """Audit oracle for qd9r/qd9r2: sample fold, adaptive width,
    fingerprints, optional exact-fingerprint collapse (the qd9c
    universe), probe draw, bucket cap, integer recall."""
    fp_src = "fpc" if collapse else "fp"
    collapse_cte = (
        """,
    fpc AS (
      SELECT min(doc_id) AS doc_id, simhash FROM fp GROUP BY simhash
    )"""
        if collapse
        else ""
    )
    return f"""
    WITH sizen AS (SELECT count(*)::BIGINT AS n FROM documents),
    sizew AS (
      SELECT least(15, greatest(8,
               CAST(ceil(log2(greatest(1, n // 4))) AS BIGINT))) AS w
      FROM sizen
    ),
    samp AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text, md5('shc:' || doc_id::VARCHAR) AS _d
        FROM documents
      ) WHERE ({_UNIT_FOLD_D}) / 4294967296.0
          < least(1.0, 65536.0 / (SELECT n FROM sizen))
    ),
    tok0 AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM samp
    ),
    tok AS (
      SELECT doc_id, md5(token) AS h, md5('b:' || token) AS h2 FROM tok0
    ),
    expanded AS (
      SELECT * FROM (SELECT doc_id, h, h2, unnest(range(60)) AS j FROM tok)
      WHERE j < 4 * (SELECT w FROM sizew)
    ),
    per_bit AS (
      SELECT doc_id, j,
             sum((((strpos('0123456789abcdef',
                           substr(CASE WHEN j < 32 THEN h ELSE h2 END,
                                  (CASE WHEN j < 32 THEN j ELSE j - 32 END
                                   + 1)::INT, 1)) - 1) % 2)
                  * 2 - 1)::BIGINT) AS s
      FROM expanded GROUP BY doc_id, j
    ),
    fp AS (
      SELECT doc_id,
             sum(CASE WHEN s > 0 THEN (1::BIGINT << j::INT) ELSE 0 END)
               ::BIGINT AS simhash
      FROM per_bit GROUP BY doc_id
    ){collapse_cte},
    probes AS (
      SELECT doc_id, simhash FROM (
        SELECT doc_id, simhash,
               md5('shp:' || doc_id::VARCHAR) AS _p
        FROM {fp_src}
      ) ORDER BY _p LIMIT 64
    ),
    banded AS (
      SELECT doc_id, band,
             (simhash >> (band * (SELECT w FROM sizew))::INT)
               & ((1::BIGINT << (SELECT w FROM sizew)::INT) - 1) AS bv
      FROM {fp_src} CROSS JOIN (SELECT unnest(range(4)) AS band)
    ),
    hot AS (
      SELECT band, bv FROM banded GROUP BY band, bv HAVING count(*) > 32
    ),
    exact AS (
      SELECT p.doc_id AS probe_id, c.doc_id AS other_id,
             p.simhash AS fp_p, c.simhash AS fp_c
      FROM probes p JOIN {fp_src} c ON p.doc_id <> c.doc_id
      WHERE bit_count(xor(p.simhash, c.simhash)) <= 3
    ),
    shared AS (
      SELECT e.probe_id, e.other_id, b.band,
             (e.fp_p >> (b.band * (SELECT w FROM sizew))::INT)
               & ((1::BIGINT << (SELECT w FROM sizew)::INT) - 1) AS bv
      FROM exact e CROSS JOIN (SELECT unnest(range(4)) AS band) b
      WHERE ((e.fp_p >> (b.band * (SELECT w FROM sizew))::INT)
               & ((1::BIGINT << (SELECT w FROM sizew)::INT) - 1))
          = ((e.fp_c >> (b.band * (SELECT w FROM sizew))::INT)
               & ((1::BIGINT << (SELECT w FROM sizew)::INT) - 1))
    ),
    surv AS (
      SELECT DISTINCT probe_id, other_id
      FROM shared s ANTI JOIN hot h ON s.band = h.band AND s.bv = h.bv
    ),
    truec AS (
      SELECT probe_id, count(*)::BIGINT AS n_true FROM exact GROUP BY 1
    ),
    hits AS (
      SELECT probe_id, count(*)::BIGINT AS n_hits FROM surv GROUP BY 1
    )
    SELECT p.doc_id AS doc_id,
           coalesce(t.n_true, 0)::BIGINT AS n_true,
           coalesce(h.n_hits, 0)::BIGINT AS n_hits,
           CASE WHEN coalesce(t.n_true, 0) = 0 THEN 1.0
                ELSE coalesce(h.n_hits, 0) / CAST(t.n_true AS DOUBLE)
           END AS recall
    FROM probes p
    LEFT JOIN truec t ON p.doc_id = t.probe_id
    LEFT JOIN hits h ON p.doc_id = h.probe_id
    """


@register(
    "qd9r_simhash_recall_audit",
    # HASH-VERIFIED: sample membership (unit fold), adaptive width,
    # fingerprints, probe draw, bucket cap, and the integer recall
    # ratio are all replayed — every reported miss is attributable
    # to the cap, measured, not narrated.
    oracle=_simhash_audit_oracle(collapse=False),
)
def qd9r_simhash_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit for qd9b's capped adaptive-width band index (r13
    verdict item #3 — the qs21/qs29 pattern for the SimHash family):
    per-probe recall of the candidate rule against exact-Hamming
    ground truth over a bounded sampled universe (≤64 probes × ≤65 k
    audit corpus — constant cost at ANY corpus size). The index under
    audit keeps its full-corpus configuration (width sized from the
    REAL document count, cap 32 on the sampled universe's buckets),
    so the number this reports is the deployed index's recall, and
    because the 4-band filter is lossless at Hamming ≤ 3, every miss
    is attributable to the bucket cap. See
    ``operators/dedup.py::simhash_recall_audit``."""
    from spotify_pipeline_gcp_spark.operators.dedup import simhash_recall_audit

    docs = table(spark, sf_dir, "documents")
    return simhash_recall_audit(
        docs, "doc_id", "text", n_docs=docs.count()
    )


@register(
    "qd9r2_simhash_recall_audit_collapsed",
    oracle=_simhash_audit_oracle(collapse=True),
)
def qd9r2_simhash_recall_audit_collapsed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """qd9r pointed at the COLLAPSED index (qd9c's candidate rule):
    same bounded eval, but exact-fingerprint cliques are represented
    once before banding, ground truth, and the cap — measuring
    whether the hypothesized mitigation recovers the recall the cap
    costs. MEASURED ANSWER (r14): no — 0.584 vs qd9r's 0.585 at
    sf0.1 (hot band values come from near-identical, not identical,
    fingerprints), and at the 5 M-doc rung BOTH audits report recall
    1.0 over a near-empty ground truth (1 true pair in the sampled
    universe) — direct confirmation that qd9b's pair shrinkage at
    scale is the ADAPTIVE-WIDTH THRESHOLD tightening (Hamming ≤ 3 of
    60 bits), not cap-driven recall loss. Collapse, sizing, cap, and
    the integer recall ratio are all oracle-replayed —
    hash-verified."""
    from spotify_pipeline_gcp_spark.operators.dedup import simhash_recall_audit

    docs = table(spark, sf_dir, "documents")
    return simhash_recall_audit(
        docs, "doc_id", "text", n_docs=docs.count(), collapse_identical=True
    )


@register(
    "qd13_duplicated_spans",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    tw AS (SELECT doc_id, t FROM t WHERE len(t) >= 8),
    posi AS (
      SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS pos FROM tw
    ),
    wins AS (
      SELECT doc_id, pos,
             md5(array_to_string(t[pos:pos+7], ' ')) AS wkey
      FROM posi
    ),
    dpos AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos, count(*) OVER (PARTITION BY wkey) AS n_occ
        FROM wins
      ) WHERE n_occ >= 2
    ),
    isl AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM dpos
    )
    SELECT doc_id,
           min(pos)::BIGINT AS span_start,
           (max(pos) + 7)::BIGINT AS span_end,
           (max(pos) + 7 - min(pos) + 1)::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_windows
    FROM isl GROUP BY doc_id, grp
    """,
)
def qd13_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span report (substring-level dedup, the
    Lee-et-al 2022 semantics — see
    ``operators/dedup.py::duplicated_spans``): every maximal token
    span whose 8-token windows ALL occur ≥2 times corpus-wide
    (cross-document duplication AND self-repetition). The family's
    only LINEAR dedup operator — no document pairing, just a window
    count and a semi-join — so it is the one that still runs when the
    corpus is 100 TB and even LSH candidate pairs are a budget item.
    The oracle replays tokenization, 1-based window hashing, the ≥2
    multiset filter, and the islands merge verbatim."""
    from spotify_pipeline_gcp_spark.operators.dedup import duplicated_spans

    return duplicated_spans(table(spark, sf_dir, "documents"), "doc_id", "text", w=8)


_QUALITY_CTES = """
    feats2 AS (
      SELECT doc_id,
             length(text)::BIGINT AS n_chars_calc,
             len(string_split(text, ' '))::BIGINT AS n_tokens,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ('the','a','of','and','to','in','is','it')))::BIGINT AS stop_hits,
             length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT AS digit_chars,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::BIGINT AS punct_chars
      FROM documents
    ),
    qual AS (
      SELECT doc_id,
             floor((least(n_tokens / 100.0, 1.0) * 0.4
                    + (stop_hits / n_tokens) * 0.3
                    + (1.0 - digit_chars / n_chars_calc) * 0.2
                    + (1.0 - punct_chars / n_chars_calc) * 0.1) * 1000000 + 0.5)
               / 1000000 AS q_r
      FROM feats2
    )
"""


@register(
    "qd14_near_dup_export",
    oracle=f"""
    WITH RECURSIVE {JACCARD_CTE},
    sigs AS (
      SELECT doc_id, seed,
             min(substr(md5((CASE WHEN seed < 4 THEN 'a:' ELSE 'b:' END) || shingle),
                        ((seed % 4) * 8 + 1)::INT, 8)) AS minhash
      FROM shingle CROSS JOIN (SELECT unnest(range(8)) AS seed)
      GROUP BY doc_id, seed
    ),
    bands AS (
      SELECT doc_id, seed // 2 AS band,
             min(CASE WHEN seed % 2 = 0 THEN minhash END) AS mh0,
             min(CASE WHEN seed % 2 = 1 THEN minhash END) AS mh1
      FROM sigs GROUP BY doc_id, band
    ),
    candidates AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.mh0 = b.mh0 AND a.mh1 = b.mh1
                   AND a.doc_id < b.doc_id
    ),
    np AS (
      SELECT c.doc_a, c.doc_b
      FROM candidates c JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
      WHERE j.jaccard >= 0.8
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM np
      UNION ALL SELECT doc_b, doc_a FROM np
    ),
    walk(node, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
    ),
    comp AS (SELECT node AS doc_id, min(label) AS component FROM walk GROUP BY node),
    {_QUALITY_CTES},
    ranked AS (
      SELECT c.doc_id,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY q.q_r DESC, c.doc_id) AS rn
      FROM comp c JOIN qual q ON q.doc_id = c.doc_id
    ),
    losers AS (SELECT doc_id FROM ranked WHERE rn > 1),
    d AS (
      SELECT doc_id, source,
             len(string_split(text, ' '))::BIGINT AS n_tokens,
             doc_id IN (SELECT doc_id FROM losers) AS dropped
      FROM documents
    )
    SELECT source,
           count(*) FILTER (WHERE NOT dropped)::BIGINT AS n_kept,
           count(*) FILTER (WHERE dropped)::BIGINT AS n_dropped,
           coalesce(sum(n_tokens) FILTER (WHERE NOT dropped), 0)::BIGINT
             AS tokens_kept
    FROM d GROUP BY source
    """,
)
def qd14_near_dup_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup dedup export end-to-end at the scale shape — the
    qp5 counterpart where the dedup gate is fuzzy instead of exact:
    MinHash-LSH candidates (qd5: band equi-join, never all-pairs) ->
    exact-Jaccard verify -> transitive closure (qd8) -> keep the
    highest-QUALITY member per cluster (qd12's policy) -> drop the
    losers -> per-source manifest (kept/dropped docs, kept tokens).
    Every stage is the already-verified operator; the composition is
    the point — this is the single DAG a production near-dup dedup
    run executes, and the oracle replays candidates, verification,
    closure (recursive CTE), policy, and accounting end to end.

    Scale shape: pair generation is the bounded LSH join, closure
    iterates on the pair graph (tiny vs the corpus), the loser list
    is |members of multi-doc clusters| << n and anti-joins the corpus
    without shuffling it, and the manifest is one combinable rollup."""
    from spotify_pipeline_gcp_spark.operators.dedup import (
        keep_best_per_cluster,
    )
    from spotify_pipeline_gcp_spark.operators.text import quality_score
    from spotify_pipeline_gcp_spark.queries.compat import fixed

    docs = table(spark, sf_dir, "documents")
    n_corpus = docs.count()  # metadata-fast; shared by the pair
    # generator's slice-bound sizing and the spool routing below
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=8,
        rows_per_band=2, threshold=0.8, n_docs=n_corpus,
    ).select("doc_a", "doc_b")
    # Stage the pair table to parquet between generation and closure
    # at scale (r12): dedup_components' first eager localCheckpoint
    # otherwise materializes the WHOLE LSH plan inside one stage
    # pipeline — the fat-array verify sort, the DISK_ONLY block
    # writes, and the label dedup's shuffle all peak together, which
    # is what flaked the 5 M-doc rung in 4 g even after the verify
    # sort was slice-bounded. A parquet spool splits the peaks: pair
    # generation runs alone (qd5's proven 1000x shape, streaming
    # write), and the closure iterates over the skinny re-read table
    # (qd8's proven shape). This is also what a production run does —
    # the pair table is the natural durable intermediate of a dedup
    # DAG. The spool is id-pairs only (~16 B/row) and is DELETED as
    # soon as the closure materializes (r13 — dedup_components runs
    # its loop eagerly and checkpoints the final label table, so
    # nothing references the spool afterwards; mkdtemp dirs are NOT
    # cleaned at process exit, and repeated large runs were leaking
    # pair tables into /tmp). The spool base honors
    # SPARK_GRAFT_SCRATCH for deployments where driver and executors
    # need a SHARED filesystem (the driver-local tempdir default is a
    # local-mode convenience). Below the threshold the plan feeds
    # the closure directly — the spool's extra job/write round-trip
    # is pure fixed overhead on toy corpora (measured +10 s at
    # sf0.1), and the peak it splits does not exist there.
    if n_corpus > _SPOOL_MIN_DOCS:
        import os
        import shutil
        import tempfile

        spool_dir = tempfile.mkdtemp(
            prefix="near_dup_export_",
            dir=os.environ.get("SPARK_GRAFT_SCRATCH"),
        )
        try:
            spool = os.path.join(spool_dir, "pairs")
            pairs.write.parquet(spool)
            spooled = spark.read.schema(
                "doc_a long, doc_b long"
            ).parquet(spool)
            comp = dedup_components(spooled)
        finally:
            shutil.rmtree(spool_dir, ignore_errors=True)
    else:
        comp = dedup_components(pairs)
    scores = quality_score(docs, "doc_id", "text").select(
        "doc_id", fixed(F.col("quality"), 6).alias("q_r")
    )
    keepers = keep_best_per_cluster(comp, scores, "doc_id", "q_r").select(
        F.col("keep_id").alias("doc_id")
    )
    losers = comp.select("doc_id").join(keepers, "doc_id", "left_anti")
    base = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens"),
    ).join(
        losers.withColumn("dropped", F.lit(True)), "doc_id", "left"
    ).withColumn("dropped", F.coalesce(F.col("dropped"), F.lit(False)))
    return base.groupBy("source").agg(
        F.count(F.when(~F.col("dropped"), 1)).cast("long").alias("n_kept"),
        F.count(F.when(F.col("dropped"), 1)).cast("long").alias("n_dropped"),
        F.coalesce(
            F.sum(F.when(~F.col("dropped"), F.col("n_tokens"))),
            F.lit(0),
        ).cast("long").alias("tokens_kept"),
    )
