import os, sys, time, json, uuid
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from pyspark.sql import functions as F
from spotify_pipeline_gcp_spark.session import get_spark
from spotify_pipeline_gcp_spark.streaming.incremental import stream_events, stream_events_with_ts
sf = "/root/testdata/sf0.1"
spark = get_spark("stream_probe", driver_memory="4g",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})

def run(tag, build, mode):
    t0 = time.time()
    df = build()
    name = f"p_{uuid.uuid4().hex[:8]}"
    q = (df.writeStream.outputMode(mode).format("memory")
           .queryName(name).trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.time() - t0
    n = spark.table(name).count()
    prog = [json.loads(p.json) for p in q.recentProgress]
    batches = [{ "batchId": p["batchId"], "durationMs": p.get("durationMs", {}),
                 "rows": p.get("numInputRows")} for p in prog]
    print(json.dumps({"tag": tag, "wall": round(wall,2), "rows": n, "batches": batches}), flush=True)

# qst3 shape
def qst3():
    ev = stream_events(spark, sf)
    cust = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment")
    return (ev.join(F.broadcast(cust), "user_id")
              .groupBy(F.col("c_mktsegment").alias("segment"))
              .agg(F.count(F.lit(1)).alias("n"),
                   (F.floor(F.sum("value") * 100 + F.lit(0.5)) / 100).alias("sum_value")))
# batch twin for comparison
t0=time.time()
ev = spark.read.parquet(f"{sf}/events.parquet").select("user_id","value")
cust = spark.read.parquet(f"{sf}/customer.parquet").select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
(ev.join(F.broadcast(cust), "user_id").groupBy("c_mktsegment")
   .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))).collect()
print(json.dumps({"tag":"qst3_batch_twin","wall":round(time.time()-t0,2)}), flush=True)

for rep in range(3):
    run(f"qst3_rep{rep}", qst3, "complete")

# qst2 shape
from spotify_pipeline_gcp_spark.streaming.incremental import streaming_sessionize
def qst2():
    ev = stream_events_with_ts(spark, sf)
    w = ev.withWatermark("ts", "1 hour")
    return (w.groupBy(F.session_window("ts", "30 minutes"), "user_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
             .select(F.col("session_window.start").alias("session_start"),
                     F.col("session_window.end").alias("session_end"),
                     "user_id", "n_events"))
for rep in range(2):
    run(f"qst2_rep{rep}", qst2, "append")
spark.stop()
