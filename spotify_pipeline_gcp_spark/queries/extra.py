"""Remaining §2-neighbor coverage: unpivot, map/JSON ops, date
arithmetic, and the reference's exact to_json bag shape."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_pipeline_gcp_spark.queries import register
from spotify_pipeline_gcp_spark.queries.compat import fixed, sql_fixed, table


@register(
    "q37_unpivot",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, metric, {sql_fixed('value', 4)} AS value_r
    FROM (
      UNPIVOT lineitem
      ON l_quantity, l_discount, l_tax
      INTO NAME metric VALUE value
    )
    """,
)
def q37_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot/melt (inverse of q20's pivot)."""
    li = table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "value",
    ).select(
        "l_orderkey", "l_linenumber", "metric", fixed(F.col("value"), 4).alias("value_r")
    )


@register(
    "q38_map_ops",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
           len(json_keys(props))::BIGINT AS n_keys
    FROM events
    """,
)
def q38_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column ops: parse JSON to map, keys, cardinality."""
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
    )


@register(
    "q39_date_arith",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 30 DAY AS due_ts,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS quarter_later,
           date_diff('day', DATE '1995-01-01', o_orderdate::DATE)::BIGINT AS days_since_epoch_start,
           (year(o_orderdate) * 12 + month(o_orderdate))::BIGINT AS month_index,
           dayofweek(o_orderdate)::BIGINT AS dow
    FROM orders
    """,
)
def q39_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic battery (F5/F6 neighbors).

    ``dayofweek``: DuckDB numbers Sunday=0; Spark Sunday=1 — aligned
    by subtracting 1 on the Spark side.
    """
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS"), "yyyy-MM-dd"
        ).alias("quarter_later"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("month_index"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
    )


@register(
    "q41_big_orders_having",
    oracle=f"""
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           {sql_fixed('o.o_totalprice')} AS total_price,
           {sql_fixed('sum(l.l_quantity)')} AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q41_big_orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered grouped subquery -> semi join
    -> enriched re-aggregation. The HAVING aggregate runs once over
    lineitem (two-phase hash agg); the qualifying-keys set is tiny and
    broadcast into the semi join — the fact table shuffles only for
    the final group-by."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 250)
        .select("l_orderkey")
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(fixed(F.sum("l_quantity")).alias("sum_qty"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            fixed(F.col("o_totalprice")).alias("total_price"),
            "sum_qty",
        )
    )


@register(
    "q42_above_group_avg",
    oracle=f"""
    SELECT p.p_partkey, p.p_brand,
           {sql_fixed('p.p_retailprice')} AS retail_price,
           {sql_fixed('b.brand_avg')} AS brand_avg
    FROM part p
    JOIN (
      SELECT p_brand, avg(p_retailprice) AS brand_avg
      FROM part GROUP BY p_brand
    ) b ON p.p_brand = b.p_brand
    WHERE p.p_retailprice > 1.05 * b.brand_avg
    """,
)
def q42_above_group_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated aggregate predicate (rows above 1.05x their group's
    mean) — decorrelated to a grouped-aggregate join, which is exactly
    what Catalyst does to correlated scalar subqueries. The per-brand
    aggregate is tiny and broadcasts."""
    p = table(spark, sf_dir, "part")
    brand_avg = p.groupBy(F.col("p_brand").alias("b_brand")).agg(
        F.avg("p_retailprice").alias("brand_avg")
    )
    return (
        p.join(F.broadcast(brand_avg), p.p_brand == brand_avg.b_brand)
        .where(F.col("p_retailprice") > 1.05 * F.col("brand_avg"))
        .select(
            "p_partkey",
            "p_brand",
            fixed(F.col("p_retailprice")).alias("retail_price"),
            fixed(F.col("brand_avg")).alias("brand_avg"),
        )
    )


@register(
    "q43_ratio_metric",
    oracle=f"""
    SELECT {sql_fixed("100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END) / sum(l.l_extendedprice * (1 - l.l_discount))", 4)} AS promo_revenue_pct,
           count(*)::BIGINT AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
    """,
)
def q43_ratio_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: global ratio of conditional revenue sums —
    single-row output, one broadcast dim join, one full agg."""
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1996-07-01 00:00:00")
    )
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cond = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            fixed(100.0 * F.sum(cond) / F.sum(rev), 4).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q40_json_bag",
    oracle="""
    SELECT l_orderkey,
           to_json(list_sort(list(struct_pack(pk := l_partkey, qty := l_quantity::BIGINT))))::VARCHAR AS bag_json
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    GROUP BY l_orderkey
    """,
)
def q40_json_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact bag shape (A1+F2): collect structs per
    group, serialize with to_json (``playback_pipeline.py:177-184``) —
    here sorted for determinism. Engine-parity note: Spark and DuckDB
    agree on compact JSON object serialization for int fields."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    return li.groupBy("l_orderkey").agg(
        F.to_json(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_partkey").alias("pk"),
                        F.col("l_quantity").cast("long").alias("qty"),
                    )
                )
            )
        ).alias("bag_json")
    )


@register(
    "q44_flagship_partition_ready",
    oracle=f"""
    WITH bag AS (
      SELECT l_orderkey,
             string_agg(l_partkey::VARCHAR, ',' ORDER BY l_partkey::VARCHAR) AS partkeys,
             count(*)::BIGINT AS n_items
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT DISTINCT
      o.o_orderkey, o.o_orderdate, o.o_orderstatus,
      {sql_fixed('o.o_totalprice')} AS total_price,
      {sql_fixed('o.o_totalprice / 1000')} AS total_k,
      b.partkeys, b.n_items
    FROM orders o LEFT JOIN bag b ON o.o_orderkey = b.l_orderkey
    """,
)
def q44_flagship_partition_ready(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q00 minus the global sort: the shape a date-partitioned sink
    actually wants.

    The reference orders its whole output before writing
    (``playback_pipeline.py:310``); q00 keeps that for parity, paying
    a sampled range exchange + total-order barrier. A partitioned
    parquet sink (sinks/writers.py::write_parquet partition_by=
    ['o_orderdate']) only needs co-location by the partition column
    and an intra-file clustering order: one hash repartition on
    o_orderdate + sortWithinPartitions(o_orderkey) — no range
    exchange, no global barrier, and each task streams straight into
    its partition directory. Same rows as q00 (the oracle is
    identical; the driver compare is order-insensitive), cheaper
    plan — the bench delta q00 vs q44 prices the sort.
    """
    from spotify_pipeline_gcp_spark.queries.core import _bag_parts

    orders = table(spark, sf_dir, "orders")
    bag = _bag_parts(table(spark, sf_dir, "lineitem"))
    return (
        orders.join(bag, orders.o_orderkey == bag.l_orderkey, "left")
        .select(
            "o_orderkey",
            "o_orderdate",
            "o_orderstatus",
            fixed(F.col("o_totalprice")).alias("total_price"),
            fixed(F.col("o_totalprice") / 1000).alias("total_k"),
            "partkeys",
            "n_items",
        )
        .dropDuplicates()
        .repartition("o_orderdate")
        .sortWithinPartitions("o_orderkey")
    )


@register(
    "q50_feature_trend",
    oracle=f"""
    WITH plays AS (
      SELECT user_id, ts, event_id % 200 AS tid FROM events
    ),
    feats AS (
      SELECT tid, ((tid * 59) % 991) / 990.0 AS energy
      FROM (SELECT DISTINCT event_id % 200 AS tid FROM events)
    ),
    joined AS (
      SELECT p.user_id, date_trunc('day', p.ts) AS day,
             CAST(round(f.energy * 990) AS BIGINT) AS e_int
      FROM plays p JOIN feats f ON f.tid = p.tid
    ),
    daily AS (
      SELECT user_id, day, count(*)::BIGINT AS n_plays,
             sum(e_int)::BIGINT AS e_sum
      FROM joined GROUP BY 1, 2
    )
    SELECT user_id, day, n_plays,
           {sql_fixed('e_sum / n_plays / 990.0', 4)} AS energy_avg,
           {sql_fixed('sum(e_sum) OVER w / sum(n_plays) OVER w / 990.0', 4)}
             AS energy_ma3
    FROM daily
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY date_diff('day', DATE '1970-01-01', day)
                 RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q50_feature_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Playback history × AUDIO FEATURES — the reference's
    declared-but-unplumbed extension closed (r7 verdict item #7): the
    reference fetches ``track_features.json`` daily
    (``main.py:27,38``; ``spotify_api.py:66-84``) but no Spark job
    ever consumes it (SURVEY §1.1). Here the S2 source
    (``sources/rest.py::AudioFeaturesSource``) feeds a J1-style join
    back to the playback fact and a per-user WINDOWED feature trend —
    daily mean energy plus a 3-day range-frame moving average — the
    query a listener-analytics deployment would run first on this
    data model.

    Plumbing is the real S2 path: track ids are extracted from the
    fact and passed as the ids CSV (the reference's own
    ``extract_track_id`` collect-to-csv pattern, bounded by the track
    dimension — 200 ids here, never fact-sized), and the response
    flows through the declared ``AUDIO_FEATURES_SCHEMA``. The fetcher
    is the injected deterministic seam the REST sources use
    everywhere in-repo (tests inject HTTP cassettes); its feature
    values are integer-derived ((tid·59 mod 991)/990), and the join
    RECOVERS the exact integers (round(energy·990)) so every
    aggregate below is an exact BIGINT sum — both engines divide the
    same integers at the end, which is what makes a two-level float
    trend (avg of avgs) hash-stable. The moving average is
    sum-of-sums / sum-of-counts over the window (a weighted 3-day
    mean — partial-aggregable, no nested avg).

    Scale shape: the feature dim is track-count-sized (broadcast
    join), the daily rollup is one map-side-combining aggregate on
    (user, day), and the trend window partitions by user — no
    corpus-sized shuffle beyond the rollup's own exchange.
    """
    from spotify_pipeline_gcp_spark.sources.rest import AudioFeaturesSource

    ev = table(spark, sf_dir, "events")
    plays = ev.select(
        "user_id", "ts", (F.col("event_id") % 200).alias("tid")
    )

    def _fetcher(endpoint: str, params: dict) -> dict:
        rows = []
        for s in params["ids"].split(","):
            t = int(s[2:])
            rows.append(
                {
                    "id": s,
                    "danceability": (t * 37 % 997) / 996.0,
                    "energy": (t * 59 % 991) / 990.0,
                    "key": t % 12,
                    "loudness": -(t * 13 % 60) / 2.0,
                    "tempo": 60.0 + (t * 73 % 120),
                    "duration_ms": 120000 + t * 1337 % 180000,
                }
            )
        return {"audio_features": rows}

    track_ids = [f"tr{t}" for t in range(200)]
    feats = AudioFeaturesSource(spark, _fetcher).load(track_ids)

    joined = plays.join(
        F.broadcast(
            feats.select(
                F.substring("id", 3, 10).cast("long").alias("tid"),
                F.round(F.col("energy") * 990).cast("long").alias("e_int"),
            )
        ),
        "tid",
    )
    daily = joined.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_plays"),
        F.sum("e_int").cast("long").alias("e_sum"),
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy(F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-2, 0)
    )
    return daily.select(
        "user_id",
        "day",
        "n_plays",
        fixed(F.col("e_sum") / F.col("n_plays") / 990.0, 4).alias(
            "energy_avg"
        ),
        fixed(
            F.sum("e_sum").over(w) / F.sum("n_plays").over(w) / 990.0, 4
        ).alias("energy_ma3"),
    )


@register(
    "q51_genre_affinity",
    oracle="""
    WITH plays AS (
      SELECT user_id, event_id % 60 AS aid FROM events
    ),
    artists AS (
      SELECT aid,
             ['g' || ((aid * 7) % 8), 'g' || ((aid * 7 + 3) % 8)] AS genres
      FROM (SELECT DISTINCT aid FROM plays)
    ),
    listens AS (
      SELECT p.user_id, unnest(a.genres) AS genre
      FROM plays p JOIN artists a USING (aid)
    ),
    counts AS (
      SELECT user_id, genre, count(*)::BIGINT AS n_plays
      FROM listens GROUP BY 1, 2
    )
    SELECT user_id, genre, n_plays, rank FROM (
      SELECT user_id, genre, n_plays,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n_plays DESC, genre)::BIGINT AS rank
      FROM counts) t
    WHERE rank <= 3
    """,
)
def q51_genre_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Playback history × ARTIST GENRES — the S3 twin of q50: the
    reference also fetches ``track_genres.json`` daily
    (``main.py:28,35``; ``spotify_api.py:87-105``) without ever
    consuming it. Here the S3 source
    (``sources/rest.py::ArtistGenresSource``) feeds the declared
    ``ARTIST_GENRES_SCHEMA`` (with its genres ARRAY column — the
    reference data model's only array-typed dimension attribute),
    the array EXPLODES against the playback fact, and a per-user
    rank window emits each listener's top-3 genres — the
    listener-taste profile query. All-integer counts with a
    deterministic (count DESC, genre) tie-break keep both engines'
    rankings identical.

    Scale shape: the genre dim is artist-count-sized (broadcast
    after explode), the count is one map-side-combining aggregate on
    (user, genre) — bounded fan-out: each play contributes exactly
    |genres| rows — and the top-3 window benefits from
    WindowGroupLimit's rank pushdown."""
    from spotify_pipeline_gcp_spark.sources.rest import ArtistGenresSource

    ev = table(spark, sf_dir, "events")
    plays = ev.select("user_id", (F.col("event_id") % 60).alias("aid"))

    def _fetcher(endpoint: str, params: dict) -> dict:
        rows = []
        for s in params["ids"].split(","):
            a = int(s[2:])
            rows.append(
                {
                    "id": s,
                    "name": f"artist {a}",
                    "genres": [f"g{(a * 7) % 8}", f"g{(a * 7 + 3) % 8}"],
                    "popularity": (a * 31) % 100,
                }
            )
        return {"artists": rows}

    artist_ids = [f"ar{a}" for a in range(60)]
    genres = ArtistGenresSource(spark, _fetcher).load(artist_ids)

    listens = plays.join(
        F.broadcast(
            genres.select(
                F.substring("id", 3, 10).cast("long").alias("aid"),
                F.explode("genres").alias("genre"),
            )
        ),
        "aid",
    )
    counts = listens.groupBy("user_id", "genre").agg(
        F.count(F.lit(1)).cast("long").alias("n_plays")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(
        F.col("n_plays").desc(), F.col("genre")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("user_id", "genre", "n_plays", "rank")
    )
