"""Round-2 relational breadth: CUBE, range window frames, date-range
join, and an oracle-checked skew-salting equivalence proof."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spotify_pipeline_gcp_spark.queries import register
from spotify_pipeline_gcp_spark.queries.compat import fixed, sql_fixed, table


@register(
    "q45_cube",
    oracle=f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           grouping(l_returnflag, l_linestatus)::BIGINT AS gid,
           count(*)::BIGINT AS n,
           {sql_fixed('sum(l_quantity)')} AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q45_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: every grouping-set combination in one pass (q21's rollup
    plus the column-wise subtotals), with grouping_id disambiguating
    subtotal rows from genuine NULL groups. One expand + one shuffle —
    Spark's Expand operator multiplies rows by the number of grouping
    sets BEFORE the exchange, so partial aggregation still applies."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            fixed(F.sum("l_quantity")).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "n",
            "sum_qty",
        )
    )


@register(
    "q46_range_frame",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderdate AS d, sum(o_totalprice) AS rev
      FROM orders GROUP BY 1
    )
    SELECT d,
           {sql_fixed("sum(rev) OVER (ORDER BY d RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)")} AS rev_7d
    FROM daily
    """,
)
def q46_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame: trailing-7-day revenue over the daily
    rollup. Spark range frames need a numeric ordering key, so the
    date becomes epoch-days (``unix_date``) and the frame is
    ``rangeBetween(-6, 0)`` — value-based, unlike q12's row-based
    frame, so calendar gaps are handled correctly. Scale note: the
    window is deliberately over the DAILY AGGREGATE (thousands of
    rows after a normal groupBy shuffle); running an unpartitioned
    window over raw facts would serialize on one task — aggregate
    first, window the rollup."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    # o_orderdate is stored as midnight-aligned TIMESTAMP_NTZ; the
    # frame needs a numeric key, so order by epoch-days of its date
    w = W.orderBy(F.unix_date(F.col("d").cast("date"))).rangeBetween(-6, 0)
    return daily.select("d", fixed(F.sum("rev").over(w)).alias("rev_7d"))


@register(
    "q47_range_join",
    oracle="""
    SELECT o.o_orderkey,
           count(l.l_orderkey)::BIGINT AS n_quick
    FROM orders o LEFT JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
    GROUP BY 1
    """,
)
def q47_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + date-range join: per order, how many of its line items
    shipped within 30 days. The equality on the order key carries the
    shuffle (hash join); the range predicate evaluates as a cheap
    post-join filter on co-located rows. A PURE range join (no equi
    key) must instead bin both sides to coarse intervals and
    equi-join on the bin — the bucketed pattern qs3/qd5 use — or it
    degenerates to a broadcast nested loop."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= F.date_add(o.o_orderdate, 30))
    )
    return (
        o.join(li, cond, "left")
        .groupBy("o_orderkey")
        .agg(F.count(li.l_orderkey).alias("n_quick"))
    )


@register(
    "qk1_salted_agg",
    oracle="""
    SELECT l_returnflag, sum(l_quantity) AS sum_value,
           count(*)::BIGINT AS n_rows
    FROM lineitem GROUP BY 1
    """,
)
def qk1_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted two-level aggregation == plain GROUP BY, proven by
    oracle: l_returnflag has 3 values over the whole fact table (the
    canonical hot-key aggregation), the salt spreads each key over 8
    partial groups, and the re-merge reproduces the exact sums
    (l_quantity is integer-valued, so no float-order concerns).
    Pattern: operators/skew.py::salted_agg_sum_count."""
    from spotify_pipeline_gcp_spark.operators.skew import salted_agg_sum_count

    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    return salted_agg_sum_count(li, ["l_returnflag"], "l_quantity", buckets=8)


@register(
    "q48_rank_battery",
    oracle=f"""
    SELECT c_custkey,
           c_mktsegment,
           ntile(4) OVER w::BIGINT AS quartile,
           {sql_fixed('percent_rank() OVER w', 6)} AS pct_rank,
           {sql_fixed('cume_dist() OVER w', 6)} AS cum_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q48_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window battery: ntile quartiles,
    percent_rank, cume_dist per market segment, ordered by account
    balance with the unique key as tie-breaker (rank functions are
    only deterministic under a total order). One shuffle (the window
    partition); at 100 TB the partition key's cardinality (segments)
    bounds parallelism, so a skewed segment serializes one task —
    same mitigation menu as any hot key: pre-aggregate, or rank
    within (segment, salt) and merge via distributed quantiles."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        fixed(F.percent_rank().over(w), 6).alias("pct_rank"),
        fixed(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


@register(
    "q49_grouping_sets",
    oracle=f"""
    SELECT coalesce(n_name, 'ALL') AS nation,
           coalesce(o_orderpriority, 'ALL') AS priority,
           grouping(n_name, o_orderpriority)::BIGINT AS gid,
           count(*)::BIGINT AS n_orders,
           {sql_fixed('sum(o_totalprice)')} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), ())
    """,
)
def q49_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the arbitrary-subtotal shape CUBE and
    ROLLUP are special cases of: per-(nation, priority) detail,
    per-nation subtotal, and the grand total in ONE pass, skipping
    the per-priority-only set a CUBE would also compute. Spark plans
    it as a single Expand (3 copies per row, one per set) above the
    join, so partial aggregation still combines map-side and the
    exchange carries one partial per (set, group) — at 100 TB this
    beats three separate aggregates by two corpus scans. grouping_id
    disambiguates subtotal rows from genuine NULLs; dims broadcast."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    j = o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    ).join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return (
        j.groupingSets(
            [["n_name", "o_orderpriority"], ["n_name"], []],
            "n_name",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            fixed(F.sum("o_totalprice")).alias("revenue"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n_orders",
            "revenue",
        )
    )
