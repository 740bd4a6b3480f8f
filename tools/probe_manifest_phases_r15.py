import os, sys, time, json
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
os.environ["SPARK_GRAFT_MANIFEST_DIR"] = "/tmp/probe_manifest_r15"
import shutil; shutil.rmtree("/tmp/probe_manifest_r15", ignore_errors=True)
from pyspark.sql import functions as F
from spotify_pipeline_gcp_spark.session import get_spark
sf = "/tmp/spark_graft_sf100"
spark = get_spark("manifest_probe", driver_memory="4g",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
from spotify_pipeline_gcp_spark.queries.compat import table
from spotify_pipeline_gcp_spark.queries.similarity import _content_probe, _digest_sample, _train_frac
from spotify_pipeline_gcp_spark.operators.similarity import (
    kmeans_centroids_quant, trained_cells_for, write_index_manifest)
from spotify_pipeline_gcp_spark.pyfiles import ensure_package_on_workers

emb = table(spark, sf, "embeddings")
corpus = emb.where(F.col("label") % 10 != 0)
t = {}
t0=time.time(); fp = _content_probe(corpus); t["fingerprint"] = time.time()-t0
ensure_package_on_workers(spark)
n = fp["n"]; k = trained_cells_for(n)
t0=time.time()
sample = _digest_sample(corpus, "ivfm:", _train_frac(n, k))
cent = kmeans_centroids_quant(sample, "vec_id", "embedding", k=k, n_iter=2)
t["trainer"] = time.time()-t0
t0=time.time()
write_index_manifest(corpus, cent, "/tmp/probe_manifest_r15/ivfm_test",
                     meta={"n": n, "k": k, "expected": (n+k-1)//k, "fingerprint": fp})
t["assign_write"] = time.time()-t0
t["n"]=n; t["k"]=k
print(json.dumps({k2: (round(v,1) if isinstance(v,float) else v) for k2,v in t.items()}))
spark.stop()
