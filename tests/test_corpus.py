"""Corpus-prep composite: stage semantics + fused plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_pipeline_gcp_spark.operators.corpus import (
    prepare_corpus,
    quality_filter,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_quality_filter_integer_exact(spark):
    docs = _docs(spark)
    kept = quality_filter(docs, "text", min_tokens=10)
    rows = kept.select("doc_id", "n_tokens", "digit_chars", "text").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_tokens >= 10
        assert r.digit_chars * 5 <= len(r.text)


def test_quality_filter_rejects(spark):
    good = "the quick brown fox jumps over the lazy dog again"
    cases = spark.createDataFrame(
        [
            (1, good),  # 10 tokens, 0 digits -> kept
            (2, "too short doc"),  # < 10 tokens -> dropped
            (3, "v 11 22 33 44 55 66 77 88 99"),  # digit-dense -> dropped
            (4, good + " 2024"),  # 4 digits / 54 chars < 20% -> kept
        ],
        ["doc_id", "text"],
    )
    kept = {r.doc_id for r in quality_filter(cases, "text").collect()}
    assert kept == {1, 4}


def test_prepare_corpus_dedup_after_filter(spark):
    # filter-then-dedup: every surviving digest appears once, and the
    # survivor is the LOWEST id among FILTERED copies of that digest
    docs = _docs(spark)
    out = prepare_corpus(docs, "doc_id", "text").cache()
    digests = out.select(F.md5("text").alias("h"), "doc_id")
    per = digests.groupBy("h").count().where(F.col("count") > 1).count()
    assert per == 0
    filtered = quality_filter(docs, "text").select(
        F.md5("text").alias("h"), "doc_id"
    )
    expect = filtered.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    missing = expect.join(digests, ["h", "doc_id"], "left_anti").count()
    assert missing == 0
    out.unpersist()


def test_prepare_corpus_split_stability(spark):
    # growing the corpus must not move existing rows between splits
    docs = _docs(spark)
    small = docs.limit(50)
    full_assign = {
        r.doc_id: r.split
        for r in prepare_corpus(docs, "doc_id", "text")
        .select("doc_id", "split")
        .collect()
    }
    small_assign = {
        r.doc_id: r.split
        for r in prepare_corpus(small, "doc_id", "text")
        .select("doc_id", "split")
        .collect()
    }
    for doc_id, split in small_assign.items():
        if doc_id in full_assign:
            assert full_assign[doc_id] == split


def test_token_shard_packing_budget_and_determinism(spark):
    from spotify_pipeline_gcp_spark.operators.corpus import token_shard_packing

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 + i))) for i in range(20)],
        "doc_id long, text string",
    )
    out = token_shard_packing(docs, budget=50, block_width=4)
    rows = {r.doc_id: (r.n_tokens, r.shard_id) for r in out.collect()}
    assert len(rows) == 20
    assert rows[0][0] == 10  # token counts correct
    # replay the greedy packing on the driver and compare exactly
    cum, expected = 0, {}
    for i in range(20):
        expected[i] = cum // 50
        cum += 10 + i
    assert {k: v[1] for k, v in rows.items()} == expected
    # shards are contiguous runs in id order, first shard is 0
    shard_of = [rows[i][1] for i in range(20)]
    assert shard_of[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(shard_of, shard_of[1:]))
    # two-level prefix sum must not depend on block width
    out2 = token_shard_packing(docs, budget=50, block_width=7)
    assert {r.doc_id: r.shard_id for r in out2.collect()} == expected


def test_prepare_corpus_observed_free_metrics(spark, tmp_path):
    # metrics come from the SAME action as the sink write — no second
    # scan; values must equal an explicit aggregation of the output
    from spotify_pipeline_gcp_spark.operators.corpus import (
        prepare_corpus,
        prepare_corpus_observed,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (12 + i % 5))) for i in range(40)],
        "doc_id long, text string",
    )
    out, obs = prepare_corpus_observed(docs, salt="ob:")
    out.write.mode("overwrite").parquet(str(tmp_path / "corpus"))
    got = obs.get
    expected = prepare_corpus(docs, salt="ob:").agg(
        {"n_tokens": "sum", "doc_id": "count"}
    ).collect()[0]
    assert got["n_docs"] == expected["count(doc_id)"]
    assert got["total_tokens"] == expected["sum(n_tokens)"]


def test_select_by_token_budget_priority_and_boundary(spark):
    from spotify_pipeline_gcp_spark.operators.corpus import select_by_token_budget

    # scores: doc 3 best, then 1, then tie (2, 4) broken by id
    scored = spark.createDataFrame(
        [(1, 0.8, 40), (2, 0.5, 40), (3, 0.9, 40), (4, 0.5, 40)],
        "doc_id long, q_r double, n_tokens long",
    )
    got = {
        r.doc_id: r.tokens_before
        for r in select_by_token_budget(scored, budget=100).collect()
    }
    # priority order: 3 (before 0), 1 (before 40), 2 (before 80,
    # crosses budget but before < 100 -> included), 4 (before 120, out)
    assert got == {3: 0, 1: 40, 2: 80}
    # budget exactly at a boundary excludes the next doc (before == budget)
    got2 = {r.doc_id for r in select_by_token_budget(scored, budget=80).collect()}
    assert got2 == {3, 1}


def test_curriculum_buckets_boundaries(spark):
    # scores 1..8, quartile thresholds 2.75/4.5/6.25 -> two per bucket;
    # a row equal to a threshold stays in the LOWER bucket
    from pyspark.sql import functions as F

    from spotify_pipeline_gcp_spark.operators.corpus import curriculum_buckets

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 9)], "id long, score double"
    )
    got = {r.id: r.bucket for r in curriculum_buckets(df, "score").collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4, 8: 4}
    # exact-threshold ties: with scores 1..5 the interpolation indexes
    # land ON datapoints (thresholds exactly 2, 3, 4), so each
    # threshold value itself must stay in the LOWER bucket
    df2 = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 6)], "id long, score double"
    )
    got2 = {r.id: r.bucket for r in curriculum_buckets(df2, "score").collect()}
    assert got2 == {1: 1, 2: 1, 3: 2, 4: 3, 5: 4}
    # no ranking window over the corpus: the plan has no Window node
    plan = curriculum_buckets(df, "score")._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan


def test_export_gate_bounded_batch_matches_default(spark):
    """The bounded (streaming, all-skinny) gate plan must reach the
    same verdict as the default plan — including when a doc_id
    repeats within a batch with DIFFERENT texts (the winner-pair key
    must be (id, digest), not id alone), and when a stored digest
    knocks out a would-be winner. Bounded mode drops text/_norm from
    the survivor contract, so the comparison is on ids + accounting
    columns."""
    from spotify_pipeline_gcp_spark.operators.corpus import export_gate

    good = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    other = "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray"
    corpus = spark.createDataFrame(
        [
            (1, good, "a"),
            (2, good, "a"),            # exact dup of 1 -> dropped
            (3, other, "a"),           # distinct content, kept
            # doc_id repeats with DIFFERENT texts: only the (3, other)
            # winner pair may survive under id 3; this third row's
            # digest loses to doc 1 (min id for `good` is 1), so an
            # id-only verdict key would wrongly keep it
            (3, good, "a"),
            (4, "short", "a"),         # 1 token -> quality-dropped
            (5, good.upper(), "b"),    # stored digest -> dropped
            (6, "held out quiz question " + other, "b"),  # contaminated
        ],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame(
        [("held out quiz question set",)], "text string"
    ).select(
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(
                    F.trim(F.regexp_replace("text", r"\s+", " ")),
                    F.lit(r"(?:^|(?<= ))(?=((\S+ ){3}\S+))"),
                    1,
                )
            )
        ).alias("gram")
    )
    stored = spark.createDataFrame(
        [(good.upper(),)], "text string"
    ).select(F.md5("text").alias("digest"))

    def survivors(bounded: bool):
        out = export_gate(
            corpus, bench, "doc_id", "text",
            stored_digests=stored, min_tokens=10, bounded_batch=bounded,
        )
        return {
            (r.doc_id, r._digest, r.n_tokens, r.source)
            for r in out.select(
                "doc_id", "_digest", "n_tokens", "source"
            ).collect()
        }

    default = survivors(False)
    bounded = survivors(True)  # window verdict
    assert bounded == default
    assert {r[0] for r in default} == {1, 3}
    # exactly ONE row for id 3 — the (3, other) winner pair
    assert sum(1 for r in default if r[0] == 3) == 1


def test_corpus_export_manifest_gates(spark):
    """Each gate drops exactly its target: short docs, repetitive
    docs, exact duplicates (higher id), and benchmark-contaminated
    docs; survivors are accounted per source."""
    from spotify_pipeline_gcp_spark.operators.corpus import (
        corpus_export_manifest,
    )

    good = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    corpus = spark.createDataFrame(
        [
            (1, good, "a"),
            (2, good, "a"),                      # exact dup of 1 -> dropped
            (3, " ".join(["spam"] * 30), "a"),   # dup3 ratio 1.0 -> dropped
            (4, "too short to pass", "a"),       # 4 tokens -> dropped
            (5, "held out quiz question " + good, "b"),  # contaminated
            (6, good.upper(), "b"),              # distinct content, kept
        ],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame(
        [(100, "the held out quiz question set", "bench")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in corpus_export_manifest(
        corpus, bench, "doc_id", "text", "source"
    ).collect()}
    assert out["a"].n_docs == 1 and out["a"].min_doc == 1
    assert out["a"].total_tokens == 12
    assert out["a"].total_chunks == 1
    assert out["b"].n_docs == 1 and out["b"].min_doc == 6
