"""Deterministic content-addressed sampling and split assignment.

Training-data pipelines need samples and train/val/test splits that
are (a) reproducible across runs and engines, (b) stable under
re-partitioning and retries, and (c) free of coordination — which
rules out ``rand()`` (per-task seeds change under retry/repartition)
and ``df.sample`` (same problem). The standard fix is hashing a
stable key and thresholding the digest: membership is a pure
function of the row's identity.

Digest comparison happens directly on the md5 hex string: hex chars
are lexicographically ordered by value, so ``md5(key) < '28f5c...'``
selects exactly the fraction that the threshold prefix encodes, with
no integer conversion — portable to any engine with ``md5`` and
string compare (the DuckDB oracles run the identical predicate).
All ops are stateless single-pass projections/filters: zero shuffle,
trivially scale-independent, and the filter sits right above the
scan where Catalyst can push surviving-column pruning down.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def fraction_to_hex_threshold(fraction: float, digits: int = 8) -> str:
    """Hex-string threshold t such that P(md5 < t) == fraction
    (to ``digits`` hex digits of resolution, default 2^-32)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    scaled = int(round(fraction * (16**digits)))
    if scaled >= 16**digits:
        return "g"  # > every hex digest ⇒ selects everything
    out = []
    for _ in range(digits):
        scaled, rem = divmod(scaled, 16)
        out.append(_HEX[rem])
    return "".join(reversed(out))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose salted digest
    falls under the fraction threshold. ``salt`` decorrelates
    independent samples drawn from the same keys."""
    t = fraction_to_hex_threshold(fraction)
    return df.where(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))) < F.lit(t)
    )


def split_column(
    key_col: str, weights: Mapping[str, float], salt: str = ""
) -> Column:
    """Label column assigning each row to one split by digest range.

    ``weights`` maps split name → weight (normalized internally);
    ranges are cumulative in the mapping's order, so the same mapping
    always yields the same assignment. A row's split never changes
    unless its key or the salt does — adding MORE data never moves
    existing rows between splits (critical for avoiding train/test
    leakage across dataset versions).
    """
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    digest = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = digest < F.lit(fraction_to_hex_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def assign_splits(
    df: DataFrame,
    key_col: str,
    weights: Mapping[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Attach a deterministic split label column (see split_column)."""
    return df.withColumn(out_col, split_column(key_col, weights, salt))


def digest_unit(digest_col: str = "_d") -> Column:
    """Uniform [0, 1) from the first 8 hex digits of the salted md5,
    via an integer digit fold (the same engine-portable hex
    extraction ``simhash`` uses): exact BIGINT arithmetic, then ONE
    division by 2^32 — both engines produce the identical double, so
    a threshold COMPUTED FROM DATA (not a precompiled hex literal
    like ``fraction_to_hex_threshold``) compares identically.
    The value derives ENTIRELY from ``digest_col``, which the caller
    must have bound to the salted md5 of its key (kept as a named
    column so codegen computes the digest once, not 8 times) — the
    key/salt pair deliberately does not appear here so the signature
    can't suggest it recomputes the digest."""
    terms = " + ".join(
        f"(instr('{_HEX}', substring({digest_col}, {j + 1}, 1)) - 1)"
        f" * CAST({16 ** (7 - j)} AS BIGINT)"
        for j in range(8)
    )
    return F.expr(f"({terms}) / 4294967296.0")


def domain_mixture_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    target: Mapping[str, float],
    salt: str = "",
) -> DataFrame:
    """Deterministic domain-mixture sampler: draw the LARGEST corpus
    whose domain proportions match ``target`` (weights over domain
    values; domains absent from the mapping are dropped) — the
    data-mixing step in front of every multi-source training run.

    The feasible total is capped by the scarcest domain relative to
    its weight (``cap = min(avail_d / w_d)``); each domain then keeps
    ``w_d * cap / avail_d`` of its rows by digest threshold. Rates
    are DATA-DEPENDENT, so membership uses ``digest_unit``'s exact
    integer fold rather than a precompiled hex literal.

    Scale shape: one combinable count per domain, an O(#domains)
    broadcast of the rate table back onto the corpus, and a pure
    row-local predicate — no corpus shuffle anywhere; Bernoulli
    thresholds realize the mixture in expectation (exact-count
    quotas would need a per-domain global sort)."""
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(d, float(w)) for d, w in sorted(target.items())],
        f"{domain_col} string, w double",
    )
    avail = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_avail")
    )
    j = avail.join(F.broadcast(wdf), domain_col)
    cap = j.agg(F.min(F.col("n_avail") / F.col("w")).alias("cap"))
    rates = j.crossJoin(F.broadcast(cap)).select(
        domain_col,
        ((F.col("w") * F.col("cap")) / F.col("n_avail")).alias("keep_frac"),
    )
    keyed = df.withColumn(
        "_d", F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    )
    return (
        keyed.join(F.broadcast(rates), domain_col)
        .where(digest_unit("_d") < F.col("keep_frac"))
        .drop("_d", "keep_frac")
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic stratified Bernoulli sample: each stratum keeps
    its own fraction (e.g. downsample dominant languages, keep all of
    rare ones — the standard corpus-rebalancing move). Membership is
    the same salted-digest threshold as ``hash_sample``, with the
    threshold selected per stratum by a CASE expression — still a
    pure row-local predicate: zero shuffle, reproducible across
    engines/retries/partitionings, and stable under dataset growth.
    Strata absent from ``fractions`` keep ``default_fraction``.
    """
    digest = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    threshold = F.lit(fraction_to_hex_threshold(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(stratum_col) == stratum,
            F.lit(fraction_to_hex_threshold(frac)),
        ).otherwise(threshold)
    return df.where(digest < threshold)


def temperature_plan(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    budget: int,
    salt: str = "",
    scale: int = 1_000_000,
) -> DataFrame:
    """Temperature-based domain rebalancing plan + realized draw —
    the multilingual/multi-source mixing rule (sample domain d in
    proportion to ``n_d^alpha`` with alpha = 0.5): big domains are
    downweighted, small ones upweighted, so the mixture is flatter
    than natural frequency without going uniform.

    alpha is fixed at 0.5 because ``sqrt`` is the one power IEEE 754
    requires to be correctly rounded — both engines produce the
    identical double from the identical BIGINT count, so the
    quantized weight ``floor(scale * sqrt(n_d))`` matches
    bit-for-bit (a general ``pow(n, alpha)`` carries no such
    guarantee). From there everything is exact integer arithmetic:
    ``target_d = (budget * weight_q) div sum(weight_q)`` (caller must
    keep ``budget * weight_q`` under 2^63), and the realized draw
    keeps rows whose salted-digest unit (``digest_unit``'s exact
    fold) falls under ``target_d / n_d`` — Bernoulli, so realized
    counts track targets in expectation, stable under retries and
    dataset growth.

    Scale shape: one combinable per-domain count, an O(#domains)
    plan (sqrt + integer div), the plan broadcast back onto the
    corpus for a pure row-local keep predicate, and one combinable
    kept-count — the corpus itself never shuffles. Output one row
    per domain: (domain, n_docs, weight_q, target_docs, kept_docs).
    """
    counts = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    weighted = counts.withColumn(
        "weight_q",
        F.floor(F.lit(float(scale)) * F.sqrt(F.col("n_docs"))).cast("long"),
    )
    total = weighted.agg(F.sum("weight_q").cast("long").alias("sum_q"))
    plan = weighted.crossJoin(F.broadcast(total)).select(
        domain_col,
        "n_docs",
        "weight_q",
        F.expr(f"({budget} * weight_q) div sum_q").alias("target_docs"),
    )
    keyed = df.withColumn(
        "_d", F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    )
    kept = (
        keyed.join(F.broadcast(plan), domain_col)
        .where(digest_unit("_d") < F.col("target_docs") / F.col("n_docs"))
        .groupBy(domain_col)
        .agg(F.count(F.lit(1)).cast("long").alias("kept_docs"))
    )
    return plan.join(kept, domain_col, "left").select(
        domain_col,
        "n_docs",
        "weight_q",
        "target_docs",
        F.coalesce(F.col("kept_docs"), F.lit(0).cast("long")).alias(
            "kept_docs"
        ),
    )


def exact_quota_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    quota: int,
    salt: str = "",
) -> DataFrame:
    """EXACT per-stratum quotas: keep precisely ``min(quota, n_s)``
    rows per stratum — the first ``quota`` rows in salted-digest
    order (digest order is pseudo-random, so the draw is unbiased;
    the unique key breaks the impossible-in-practice digest ties).
    This is the exact-count counterpart to ``stratified_sample``'s
    Bernoulli thresholds: thresholds are shuffle-free but only hit
    quotas in expectation; audits, eval-set construction, and
    fixed-budget exports need the exact count.

    Scale shape: ONE shuffle on the stratum key, then a rank window
    per stratum. The window input is the full stratum, so a dominant
    stratum serializes one task — when quota << n_s, prefilter with
    ``hash_sample`` at ~3·quota/n_s (the same salt/digest, so the
    prefilter keeps a superset of the final draw... rank order among
    survivors is unchanged) to bound the window input, accepting the
    ~e^-quota tail risk of an under-filled stratum, or keep this
    exact form and let AQE split nothing (rank windows don't split)
    — the trade is documented, the exact form is what is registered.
    """
    digest = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(
        digest.alias("_d"), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= quota)
        .drop("_rk")
    )
