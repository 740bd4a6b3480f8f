"""Multi-dimensional data layout (Z-order) for scan pruning.

Parquet scans prune at file/row-group granularity from min/max
statistics, so WHICH ROWS SHARE A FILE decides how much of a 100 TB
table a filtered scan reads. Sorting by one column gives perfect
pruning on that column and none on any other; interleaving the bits
of several columns (the Z-order / Morton curve — the same layout
Delta's OPTIMIZE ZORDER BY and Iceberg's sort orders use) keeps every
file tight in ALL interleaved dimensions at once, so predicates on
any of them skip most files.

Everything here is native column arithmetic (shift/mask/sum — inside
whole-stage codegen): one tiny min/max aggregate row broadcasts back,
each row computes its key locally, and a range repartition + in-file
sort produces the layout. No UDFs, no driver loops; the range
exchange is the one shuffle, which any layout rewrite needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 12,
    out_col: str = "zkey",
) -> DataFrame:
    """Attach the Morton (Z-order) key of ``cols``: each column is
    min/max-scaled to ``bits`` bits and the bits interleave
    round-robin (column i owns bit positions j*n + i), so the key is
    a space-filling-curve index — rows close in every dimension get
    close keys.

    Min/max linear scaling is one broadcast aggregate row — cheap and
    streaming-friendly; rank-based scaling (equi-depth) resists skew
    better but costs a global sort, the thing this operator exists to
    avoid. Constant columns scale to 0 (zero-span guard) and drop out
    of the ordering naturally. ``bits * len(cols)`` must fit a signed
    long (<= 63).
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder needs at least one column")
    if bits * n > 63:
        raise ValueError(
            f"bits ({bits}) * columns ({n}) = {bits * n} exceeds a signed long (63)"
        )
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_zmin_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"_zmax_{i}") for i, c in enumerate(cols)],
    )
    j = df.crossJoin(F.broadcast(stats))
    top = float(2**bits - 1)
    scaled: list[Column] = []
    for i, c in enumerate(cols):
        lo, hi = F.col(f"_zmin_{i}"), F.col(f"_zmax_{i}")
        span = hi - lo
        frac = F.when(span > 0, (F.col(c).cast("double") - lo) / span).otherwise(
            F.lit(0.0)
        )
        scaled.append(F.floor(frac * F.lit(top)).cast("long"))
    zkey = F.lit(0).cast("long")
    for b in range(bits):
        for i in range(n):
            bit = F.shiftright(scaled[i], b).bitwiseAND(F.lit(1))
            zkey = zkey + F.shiftleft(bit, b * n + i)
    return j.withColumn(out_col, zkey).drop(
        *[f"_zmin_{i}" for i in range(n)], *[f"_zmax_{i}" for i in range(n)]
    )


def write_parquet_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 12,
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of ``cols``:
    range-repartition on the Morton key (each output file owns a
    contiguous curve segment — tight min/max in every interleaved
    dimension), sort within files so row groups inherit the same
    tightness, drop the key, write. Filtered scans on ANY of ``cols``
    then skip most files from footer statistics alone — the layout
    HALF of predicate pushdown, which row-group skipping can only
    exploit if writes colocate similar rows in the first place."""
    keyed = with_zorder_key(df, cols, bits)
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(n, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
