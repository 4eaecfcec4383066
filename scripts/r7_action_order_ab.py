import json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from pyspark.sql import functions as F
from session_graph_spark import corpus
from session_graph_spark.plans.pipeline import (alias_df, mention_arrays_from_turns,
    normalized_labels_from_arrays, prepare_turns)
from session_graph_spark.session import bench_shuffle_partitions, get_spark, warm_udf_workers

cpus, sf, reps = 32, 1.0, 3
spark = get_spark(app_name="order_ab", master=f"local[{cpus}]",
                  shuffle_partitions=bench_shuffle_partitions(cpus))
spark.sparkContext.setLogLevel("ERROR")
n_convs = max(300, int(1_800_000 * sf))
path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
spark.read.parquet(path).count()
warm_udf_workers(spark, spark.read.parquet(path), cpus)
aliases = alias_df(spark)

def arm(order):
    spark.catalog.clearCache()
    m = mention_arrays_from_turns(prepare_turns(spark.read.parquet(path))).cache()
    lb = normalized_labels_from_arrays(m, aliases).cache()
    if order == "mentions_first":
        nm = m.agg(F.sum(F.size("norm_labels"))).collect()[0][0]
        nl = lb.count()
    else:
        nl = lb.count()
        nm = m.agg(F.sum(F.size("norm_labels"))).collect()[0][0]
    m.unpersist(); lb.unpersist()
    return (int(nm), int(nl))

samples, counts = {}, {}
order = ["mentions_first", "labels_first"]
for r in range(reps):
    rot = order[r % 2:] + order[:r % 2]
    for name in rot:
        t0 = time.time(); c = arm(name)
        samples.setdefault(name, []).append(round(time.time() - t0, 3))
        counts.setdefault(name, set()).add(c)
print(json.dumps({"equal": counts["mentions_first"] == counts["labels_first"],
                  "best": {k: min(v) for k, v in sorted(samples.items())}, "samples": samples}))
spark.stop()
