"""Structured Streaming parity: dedup + rollup under AvailableNow."""

from __future__ import annotations

from spotify_pipeline_gcp_spark.streaming.incremental import (
    streaming_dedup,
    streaming_type_rollup,
)

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_dedup_by_key(spark):
    out = streaming_dedup(spark, SF_DIR, ["event_id"])
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert out.count() == batch.select("event_id").distinct().count()


def test_streaming_rollup_equals_batch(spark):
    from pyspark.sql import functions as F

    stream = {
        r.event_type: (r.n, r.sum_value)
        for r in streaming_type_rollup(spark, SF_DIR).collect()
    }
    batch = {
        r.event_type: (r.n, r.sum_value)
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.floor(F.sum("value") * 100 + F.lit(0.5)) / 100).alias("sum_value"),
        )
        .collect()
    }
    assert stream == batch


def test_streaming_incremental_near_dup_matches_batch(spark):
    """Single-batch AvailableNow drain == batch qd11 computation."""
    from pyspark.sql import functions as F

    from spotify_pipeline_gcp_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
    )
    from spotify_pipeline_gcp_spark.streaming.incremental import (
        streaming_incremental_near_dup,
    )

    new_srcs = ["src15", "src16", "src17", "src18", "src19"]
    out = streaming_incremental_near_dup(spark, SF_DIR, new_srcs)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    batch = minhash_lsh_pairs_incremental(
        docs.where(~F.col("source").isin(new_srcs)),
        docs.where(F.col("source").isin(new_srcs)),
        "doc_id",
        "text",
    )
    got = {(r.doc_old, r.doc_new, round(r.jaccard, 9)) for r in out.collect()}
    want = {(r.doc_old, r.doc_new, round(r.jaccard, 9)) for r in batch.collect()}
    assert got == want
    assert got  # non-vacuous: sf0.001 has near-dup pairs across the split


def test_streaming_incremental_near_dup_two_batches(spark, tmp_path):
    """The delta arriving as TWO micro-batches (maxFilesPerTrigger=1)
    yields the same pair set as one batch: each new doc is matched
    against the stored corpus signatures in whichever batch it
    arrives, and the sink appends per batch."""
    from pyspark.sql import functions as F

    from spotify_pipeline_gcp_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
    )
    from spotify_pipeline_gcp_spark.streaming.incremental import (
        DOCUMENTS_STREAM_SCHEMA,
        run_near_dup_stream,
    )

    new_srcs = ["src15", "src16", "src17", "src18", "src19"]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.where(~F.col("source").isin(new_srcs))
    delta = docs.where(F.col("source").isin(new_srcs))
    # land the delta as two separate files so the file source sees
    # two triggers
    delta_dir = tmp_path / "delta"
    half = F.col("doc_id") % 2 == 0
    delta.where(half).coalesce(1).write.parquet(str(delta_dir / "f0"))
    delta.where(~half).coalesce(1).write.parquet(str(delta_dir / "f1"))
    stream = (
        spark.readStream.schema(DOCUMENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(delta_dir))
    )
    out = run_near_dup_stream(corpus, stream, store_dir=str(tmp_path / "store"))
    batch = minhash_lsh_pairs_incremental(corpus, delta, "doc_id", "text")
    got = {(r.doc_old, r.doc_new, round(r.jaccard, 9)) for r in out.collect()}
    want = {(r.doc_old, r.doc_new, round(r.jaccard, 9)) for r in batch.collect()}
    assert got == want
    assert got


def test_sessionize_oracle_tied_timestamps(spark, tmp_path):
    """A session-BOUNDARY event that shares its timestamp with another
    same-user event must land in the NEW session on both engines: the
    oracle's cumulative-sum window tie-breaks on (ts, event_id) like
    its flag window — with ts-only ordering the tied non-boundary row
    could fold into the previous session nondeterministically.
    session_window merges tied events by construction, so only the
    oracle can get this wrong."""
    import datetime as dt

    import duckdb
    import pandas as pd

    from spotify_pipeline_gcp_spark.queries import load_all

    def t(h, m):
        return dt.datetime(2026, 8, 13, h, m)

    rows = [
        # session 1: two events, closes 09:40
        (1, t(9, 0), 1, "play", 1.0, "{}"),
        (2, t(9, 10), 1, "play", 1.0, "{}"),
        # 40-min silence, then a boundary event TIED with a second
        # event at the same instant -> one new 2-event session
        (3, t(9, 50), 1, "play", 1.0, "{}"),
        (4, t(9, 50), 1, "play", 1.0, "{}"),
        # far-future singleton advances the watermark past both
        # sessions' ends; itself stays in state (append mode)
        (5, t(20, 0), 1, "play", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"))

    spec = load_all()["qst2_streaming_sessionize"]
    got = {
        (r.session_start, r.session_end, r.user_id, r.n_events)
        for r in spec.fn(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    want = {
        (r[0], r[1], r[2], r[3]) for r in con.execute(spec.oracle).fetchall()
    }
    expected = {
        (t(9, 0), t(9, 40), 1, 2),
        (t(9, 50), t(10, 20), 1, 2),
    }
    assert got == expected
    assert want == expected


def test_streaming_export_gate_two_batches(spark, tmp_path):
    """Every gate fires across micro-batch boundaries: corpus-known
    duplicates drop, a CROSS-BATCH duplicate keeps only its first
    arrival (the digest store grows per batch), contaminated and
    short docs drop, clean docs pass."""
    from pyspark.sql import functions as F

    from spotify_pipeline_gcp_spark.streaming.incremental import (
        DOCUMENTS_STREAM_SCHEMA,
        streaming_export_gate,
    )

    good_a = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    good_b = "kilo lima mike november oscar papa quebec romeo sierra tango"
    rows = [
        (0, good_a, "en", "old", len(good_a)),          # corpus
        (100, "the quiz question set alpha omega", "en", "src0", 33),
        (1, good_a, "en", "n1", len(good_a)),           # dup of corpus
        (2, good_b, "en", "n1", len(good_b)),           # clean -> kept
        (3, good_b, "en", "n1", len(good_b)),           # cross-batch dup
        (4, "prefix the quiz question set trailer words here pad pad",
         "en", "n1", 55),                               # contaminated
        (5, "too short here", "en", "n1", 14),          # < 10 tokens
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = tmp_path / "sf"
    docs.coalesce(1).write.parquet(str(sf / "documents.parquet"))
    delta = docs.where(F.col("source") == "n1")
    delta_dir = tmp_path / "delta"
    delta.where(F.col("doc_id") <= 2).coalesce(1).write.parquet(
        str(delta_dir / "f0")
    )
    delta.where(F.col("doc_id") > 2).coalesce(1).write.parquet(
        str(delta_dir / "f1")
    )
    stream = (
        spark.readStream.schema(DOCUMENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(delta_dir))
    )
    out = streaming_export_gate(
        spark, str(sf), ["n1"],
        store_dir=str(tmp_path / "store"), delta_stream=stream,
    )
    got = {(r.doc_id, r.n_tokens) for r in out.collect()}
    assert got == {(2, 10)}


def test_streaming_export_gate_restart_is_idempotent(spark, tmp_path):
    """Restart semantics: a second run over the SAME store/checkpoint
    processes zero new batches (checkpoint skips completed ones) and
    the accepted output is unchanged — foreachBatch's at-least-once
    replays land in deterministic per-batch_id overwrite directories,
    so nothing double-appends. Also exercises the fires-no-batch read
    path (accepted exists, no new b<i> dirs)."""
    from pyspark.sql import functions as F

    from spotify_pipeline_gcp_spark.streaming.incremental import (
        DOCUMENTS_STREAM_SCHEMA,
        streaming_export_gate,
    )

    good = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    rows = [
        (100, "the quiz question set alpha omega", "en", "src0", 33),
        (1, good, "en", "n1", len(good)),
        (2, "too short", "en", "n1", 9),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = tmp_path / "sf"
    docs.coalesce(1).write.parquet(str(sf / "documents.parquet"))
    delta_dir = tmp_path / "delta"
    docs.where(F.col("source") == "n1").coalesce(1).write.parquet(
        str(delta_dir / "f0")
    )

    def run():
        stream = (
            spark.readStream.schema(DOCUMENTS_STREAM_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(str(delta_dir))
        )
        return streaming_export_gate(
            spark, str(sf), ["n1"],
            store_dir=str(tmp_path / "store"), delta_stream=stream,
        )

    first = {(r.doc_id, r.n_tokens) for r in run().collect()}
    assert first == {(1, 10)}
    second = {(r.doc_id, r.n_tokens) for r in run().collect()}
    assert second == first  # nothing re-appended, nothing lost


def test_streaming_export_gate_midbatch_replay_keeps_own_docs(spark, tmp_path):
    """At-least-once replay of a PARTIALLY-committed batch: simulate a
    crash between the digest write and the checkpoint commit by
    deleting the checkpoint after a successful run — the second run
    replays file f0 as batch 0 with digests/b0 already on disk. The
    stored-digest read must EXCLUDE the replaying batch's own b0
    directory, or the replay anti-joins away its own previously
    accepted docs and overwrites accepted/b0 with an empty frame."""
    import shutil

    from pyspark.sql import functions as F

    from spotify_pipeline_gcp_spark.streaming.incremental import (
        DOCUMENTS_STREAM_SCHEMA,
        streaming_export_gate,
    )

    good = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    rows = [
        (100, "the quiz question set alpha omega", "en", "src0", 33),
        (1, good, "en", "n1", len(good)),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = tmp_path / "sf"
    docs.coalesce(1).write.parquet(str(sf / "documents.parquet"))
    delta_dir = tmp_path / "delta"
    docs.where(F.col("source") == "n1").coalesce(1).write.parquet(
        str(delta_dir / "f0")
    )

    def run():
        stream = (
            spark.readStream.schema(DOCUMENTS_STREAM_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(str(delta_dir))
        )
        return streaming_export_gate(
            spark, str(sf), ["n1"],
            store_dir=str(tmp_path / "store"), delta_stream=stream,
        )

    first = {(r.doc_id, r.n_tokens) for r in run().collect()}
    assert first == {(1, 10)}
    # crash window: digests/b0 persisted, checkpoint commit lost
    shutil.rmtree(str(tmp_path / "store" / "checkpoint"))
    replayed = {(r.doc_id, r.n_tokens) for r in run().collect()}
    assert replayed == first  # replay must not drop its own docs


def test_streaming_index_maintenance_two_batch_accounting(spark, tmp_path, monkeypatch):
    """qst7: cross-batch fill accounting — batch 1's visible
    n_indexed must equal batch 0's n_indexed + n_delta per cell (state
    grew through the delta store), the drained final state must equal
    the batch qs22b report on the same rows, and the executed
    micro-batch plan must be captured with the broadcast assignment."""
    from spotify_pipeline_gcp_spark.queries.similarity import (
        ensure_ivfm_manifest,
        qs22b_ann_index_maintenance_manifest,
    )
    from spotify_pipeline_gcp_spark.streaming import lastplan
    from spotify_pipeline_gcp_spark.streaming.incremental import (
        streaming_index_maintenance,
    )

    monkeypatch.setenv("SPARK_GRAFT_MANIFEST_DIR", str(tmp_path / "man"))
    sf_dir = "/root/testdata/sf0.001"
    path = ensure_ivfm_manifest(spark, sf_dir)
    out = streaming_index_maintenance(
        spark, sf_dir, path, store_dir=str(tmp_path / "store")
    )
    final = {r.cid: r for r in out.collect()}

    b0 = {
        r.cid: r
        for r in spark.read.parquet(
            str(tmp_path / "store" / "reports" / "b0")
        ).collect()
    }
    b1 = {
        r.cid: r
        for r in spark.read.parquet(
            str(tmp_path / "store" / "reports" / "b1")
        ).collect()
    }
    assert set(b0) == set(b1) == set(final)
    for cid, r1 in b1.items():
        r0 = b0[cid]
        assert r1.n_indexed == r0.n_indexed + r0.n_delta  # state grew
        assert final[cid].n_delta == r0.n_delta + r1.n_delta
        assert final[cid].n_total == r1.n_total

    want = {
        tuple(r)
        for r in qs22b_ann_index_maintenance_manifest(spark, sf_dir).collect()
    }
    assert {tuple(r) for r in out.collect()} == want

    plan = lastplan.get()
    assert plan is not None
    assert "Broadcast" in plan, plan  # the O(|batch|*k) assignment pass


def test_streaming_ann_serving_two_batch_equals_qs18(spark, tmp_path, monkeypatch):
    """qst8: the drained streaming serving result must equal batch
    qs18 on the same rows (per-query top-k is independent of other
    queries), both spooled micro-batches must have produced result
    dirs, a checkpoint-lost replay must not duplicate rows
    (per-batch_id overwrite), and the captured micro-batch plan must
    broadcast the bounded query side."""
    from spotify_pipeline_gcp_spark.queries.similarity import (
        ensure_pq_store,
        qs18_pq_adc_topk,
    )
    from spotify_pipeline_gcp_spark.streaming import lastplan
    from spotify_pipeline_gcp_spark.streaming.incremental import (
        streaming_ann_serving,
    )

    monkeypatch.setenv("SPARK_GRAFT_MANIFEST_DIR", str(tmp_path / "man"))
    sf_dir = "/root/testdata/sf0.001"
    path = ensure_pq_store(spark, sf_dir)
    store = str(tmp_path / "store")
    out = streaming_ann_serving(spark, sf_dir, path, store_dir=store)
    got = {tuple(r) for r in out.collect()}

    import os

    batches = sorted(os.listdir(os.path.join(store, "results")))
    assert len(batches) == 2 and batches[0] == "b0"  # two micro-batches

    want = {tuple(r) for r in qs18_pq_adc_topk(spark, sf_dir).collect()}
    assert got == want and len(got) > 0

    plan = lastplan.get()
    assert plan is not None
    assert "Broadcast" in plan, plan  # bounded query side broadcast

    # crash window: results/b* persisted, checkpoint commit lost —
    # replay rewrites identical content instead of duplicating
    import shutil

    shutil.rmtree(os.path.join(store, "checkpoint"))
    replayed = {
        tuple(r)
        for r in streaming_ann_serving(
            spark, sf_dir, path, store_dir=store
        ).collect()
    }
    assert replayed == got
