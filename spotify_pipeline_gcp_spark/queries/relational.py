"""Relational breadth beyond the reference's exact call set.

SURVEY §2 phase-2: "the standard neighbors the driver's oracle can
check ... so the capability surface is complete, not just the
reference's exact calls." Outer/cross joins, set ops, string/array
functions, analytic windows (lag/lead/rank), sessionization, as-of
join, scalar subquery, exact percentile, conditional aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spotify_pipeline_gcp_spark.queries import register
from spotify_pipeline_gcp_spark.queries.compat import fixed, sql_fixed, table


@register(
    "q23_full_outer_join",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nationkey, count(*)::BIGINT AS n_cust
               FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nationkey, count(*)::BIGINT AS n_supp
               FROM supplier GROUP BY 1)
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
           coalesce(c.n_cust, 0) AS n_cust,
           coalesce(s.n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def q23_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with null-side coalescing."""
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, "nationkey", "full_outer").select(
        "nationkey",
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "q24_cross_join",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def q24_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny inputs (dimension enumeration)."""
    r = table(spark, sf_dir, "region").select("r_name")
    s = table(spark, sf_dir, "orders").select("o_orderstatus").dropDuplicates()
    return r.crossJoin(s)


@register(
    "q25_except",
    oracle="""
    SELECT c_custkey AS key FROM customer
    EXCEPT
    SELECT s_suppkey AS key FROM supplier
    """,
)
def q25_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference): customer keys that are not
    supplier keys."""
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("key"))
    # subtract == SQL EXCEPT (distinct). exceptAll().dropDuplicates()
    # is NOT equivalent: a key on both sides with higher multiplicity
    # on the left survives exceptAll and then passes dedup.
    return c.subtract(s)


@register(
    "q26_intersect",
    oracle="""
    SELECT DISTINCT p_type FROM part WHERE p_brand = 'Brand#1'
    INTERSECT
    SELECT DISTINCT p_type FROM part WHERE p_brand = 'Brand#2'
    """,
)
def q26_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set intersection)."""
    p = table(spark, sf_dir, "part")
    b1 = p.where(F.col("p_brand") == "Brand#1").select("p_type").dropDuplicates()
    b2 = p.where(F.col("p_brand") == "Brand#2").select("p_type").dropDuplicates()
    return b1.intersect(b2)


@register(
    "q27_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substr(p_type, 1, 5) AS type_prefix,
           replace(p_name, ' ', '_') AS name_snake,
           length(p_name)::BIGINT AS name_len,
           concat(p_brand, '/', p_type) AS brand_type
    FROM part
    """,
)
def q27_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery (F8 neighbors): case, substring,
    replace, length, concat."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "q28_null_handling",
    oracle="""
    SELECT event_id,
           coalesce(json_extract_string(props, '$.missing'), 'absent') AS missing_k,
           (json_extract_string(props, '$.k') IS NULL) AS k_is_null,
           nullif(event_type, 'error') AS type_or_null
    FROM events
    """,
)
def q28_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null semantics: coalesce over absent JSON keys, IS NULL,
    nullif."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(
            F.get_json_object("props", "$.missing"), F.lit("absent")
        ).alias("missing_k"),
        F.get_json_object("props", "$.k").isNull().alias("k_is_null"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
    )


@register(
    "q29_window_lag_lead",
    oracle=f"""
    SELECT user_id, event_id, ts, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           {sql_fixed("value - coalesce(lag(value) OVER w, value)")} AS delta,
           rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id)::BIGINT AS value_rank,
           dense_rank() OVER (PARTITION BY user_id ORDER BY event_type)::BIGINT AS type_dense_rank
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q29_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: lag/lead offsets, rank, dense_rank."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wr = W.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    wd = W.partitionBy("user_id").orderBy("event_type")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        fixed(
            F.col("value") - F.coalesce(F.lag("value").over(w), F.col("value"))
        ).alias("delta"),
        F.rank().over(wr).cast("long").alias("value_rank"),
        F.dense_rank().over(wd).cast("long").alias("type_dense_rank"),
    )


@register(
    "q30_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1
                  ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, ts,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
             AS session_id
    FROM flagged
    """,
)
def q30_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute inactivity gap starts a new session
    (lag + cumulative sum — the batch twin of streaming
    ``session_window``). Comparison in integer microseconds on both
    sides to avoid float/second-truncation drift."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flag = (
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(gap_us > 1_800_000_000, 1)
        .otherwise(0)
    )
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(flag).over(wsum).cast("long").alias("session_id"),
    )


@register(
    "q31_asof_last_click",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
      FROM events
    )
    SELECT event_id, user_id, ts, last_click_ts
    FROM ordered WHERE event_type = 'purchase'
    """,
)
def q31_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (point-in-time lookup): for each purchase, the most
    recent prior-or-same-instant click by the same user. Implemented
    as a carried-forward window (``last(..., ignorenulls)``) — one
    shuffle on the entity key, no range-join blowup; the pattern that
    replaces ``merge_asof`` at scale."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        ev.withColumn(
            "last_click_ts", F.last(click_ts, ignorenulls=True).over(w)
        )
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_click_ts")
    )


@register(
    "q32_scalar_subquery",
    oracle=f"""
    SELECT o_orderkey, {sql_fixed('o_totalprice')} AS total_price
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def q32_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery predicate (orders above 1.5x the global mean) —
    expressed as a broadcast of a 1-row aggregate, the distributed
    equivalent of the correlated scalar."""
    o = table(spark, sf_dir, "orders")
    avg_price = o.agg(F.avg("o_totalprice").alias("ap"))
    return (
        o.crossJoin(F.broadcast(avg_price))
        .where(F.col("o_totalprice") > 1.5 * F.col("ap"))
        .select("o_orderkey", fixed(F.col("o_totalprice")).alias("total_price"))
    )


@register(
    "q33_conditional_agg",
    oracle=f"""
    SELECT user_id,
           count(*)::BIGINT AS n_events,
           count(CASE WHEN value > 50 THEN 1 END)::BIGINT AS n_big,
           {sql_fixed("avg(CASE WHEN event_type = 'purchase' THEN value END)")} AS avg_purchase,
           max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS had_error
    FROM events GROUP BY user_id
    """,
)
def q33_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (filtered counts/avgs in one pass)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("value") > 50, 1)).alias("n_big"),
        fixed(
            F.avg(F.when(F.col("event_type") == "purchase", F.col("value")))
        ).alias("avg_purchase"),
        F.max(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).cast("long").alias("had_error"),
    )


@register(
    "q34_array_agg_ops",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list_sort(list_distinct(list(l_suppkey))), ',') AS suppkeys,
           len(list_distinct(list(l_suppkey)))::BIGINT AS n_supp,
           list_contains(list(l_suppkey), 1) AS has_supp1
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q34_array_agg_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + array ops: collect_set -> sort -> join/
    contains (A1 family with set semantics)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.array_sort(F.collect_set("l_suppkey")), ","
        ).alias("suppkeys"),
        F.size(F.collect_set("l_suppkey")).cast("long").alias("n_supp"),
        F.array_contains(F.collect_list("l_suppkey"), 1).alias("has_supp1"),
    )


@register(
    "q35_exact_percentiles",
    oracle=f"""
    SELECT l_returnflag,
           {sql_fixed('quantile_cont(l_quantity, 0.5)')} AS median_qty,
           {sql_fixed('quantile_cont(l_extendedprice, 0.9)')} AS p90_price,
           {sql_fixed('min(l_extendedprice)')} AS min_price,
           {sql_fixed('max(l_extendedprice)')} AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q35_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation) + min/max. At
    100 TB swap ``percentile`` for ``percentile_approx`` (t-digest,
    mergeable, one pass) — registered separately as q36 rows-only."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        fixed(F.expr("percentile(l_quantity, 0.5)")).alias("median_qty"),
        fixed(F.expr("percentile(l_extendedprice, 0.9)")).alias("p90_price"),
        fixed(F.min("l_extendedprice")).alias("min_price"),
        fixed(F.max("l_extendedprice")).alias("max_price"),
    )


@register(
    "q36_approx_aggregates",
    oracle="""
    SELECT l_returnflag,
           TRUE AS parts_within_10pct,
           TRUE AS p90_within_rank_band
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q36_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the mergeable-sketch family that
    replaces exact distinct/percentile at 100 TB (HLL++ and t-digest /
    Greenwald-Khanna; single pass, bounded memory, no expand) — as a
    HASH-VERIFIED tolerance audit (r9 verdict item #7: this was the
    one non-BLAS rows-only record). Raw sketch estimates are
    engine-specific and can never hash-match an oracle, but their
    ERROR BOUNDS can: the query emits per-group booleans asserting
    each estimate sits inside its documented bound — HLL++ default
    rsd 5% asserted at a 2x margin (10%), percentile_approx default
    accuracy 1e4 (rank error ~1e-4·n) asserted inside the exact
    [p88, p92] rank band — and the oracle emits literal TRUE per
    group, so the driver hash is green iff every bound holds. The
    exact sides (count distinct, interpolated percentiles) are cheap
    at audit time and only exist to check the sketches; production
    consumes the estimates themselves (the q35 docstring's routing),
    with tests/test_approx_tolerance.py pinning the raw-value
    tolerances."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("ap"),
        F.countDistinct("l_partkey").alias("xp"),
        F.percentile_approx("l_extendedprice", 0.9).alias("p90a"),
        F.expr("percentile(l_extendedprice, 0.88)").alias("p88"),
        F.expr("percentile(l_extendedprice, 0.92)").alias("p92"),
    )
    return agg.select(
        "l_returnflag",
        (
            F.abs(F.col("ap") - F.col("xp"))
            <= F.lit(0.10) * F.col("xp")
        ).alias("parts_within_10pct"),
        (
            (F.col("p90a") >= F.col("p88")) & (F.col("p90a") <= F.col("p92"))
        ).alias("p90_within_rank_band"),
    )
