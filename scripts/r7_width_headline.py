import json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from pyspark.sql import functions as F
from session_graph_spark import corpus
from session_graph_spark.plans.pipeline import resolve
from session_graph_spark.session import get_spark, warm_udf_workers

cpus = 32
width = int(sys.argv[1])
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
spark = get_spark(app_name=f"width_headline_{width}", master=f"local[{cpus}]",
                  shuffle_partitions=width)
spark.sparkContext.setLogLevel("ERROR")
path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(1_800_000, 42)}"
spark.read.parquet(path).count()
warm_udf_workers(spark, spark.read.parquet(path), cpus)
w = resolve(spark, corpus.generate_turns(spark, n_convs=300, seed=7))
w.mention_clusters.count(); w.unpersist(); spark.catalog.clearCache()
best = None
for _ in range(reps):
    spark.catalog.clearCache()
    t0 = time.time()
    res = resolve(spark, spark.read.parquet(path))
    res.clusters.count(); res.mention_clusters.count()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
    res.unpersist()
print(json.dumps({"width": width, "er_best": round(best, 3)}))
spark.stop()
