import os, sys, time, json
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from pyspark.sql import functions as F
from spotify_pipeline_gcp_spark.session import get_spark
from spotify_pipeline_gcp_spark.operators.dedup import dedup_components
spark = get_spark("diam_probe", driver_memory="4g",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
out = {}
for n in (100_000, 1_000_000):
    # worst-case diameter: one chain 0-1-2-...-n
    edges = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    t0 = time.time()
    try:
        comp = dedup_components(edges, max_iter=30)
        n_comp = comp.agg(F.countDistinct("component")).collect()[0][0]
        out[f"chain_{n}"] = {"wall": round(time.time()-t0,1), "components": n_comp}
    except RuntimeError as e:
        out[f"chain_{n}"] = {"wall": round(time.time()-t0,1), "err": str(e)[:80]}
    print(json.dumps(out), flush=True)
# bounded-degree random graph (the near-dup shape): 1M nodes, 2M edges
e2 = spark.range(2_000_000).select(
    (F.pmod(F.xxhash64("id"), F.lit(1_000_000))).alias("doc_a"),
    (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1_000_000))).alias("doc_b"),
).where(F.col("doc_a") != F.col("doc_b"))
t0=time.time()
comp = dedup_components(e2, max_iter=30)
n_comp = comp.agg(F.countDistinct("component")).collect()[0][0]
out["random_1M_2Medges"] = {"wall": round(time.time()-t0,1), "components": n_comp}
print(json.dumps(out), flush=True)
spark.stop()
