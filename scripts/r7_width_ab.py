import json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from pyspark.sql import functions as F
from session_graph_spark import corpus
from session_graph_spark.plans.pipeline import (alias_df, mention_arrays_from_turns,
    normalized_labels_from_arrays, prepare_turns)
from session_graph_spark.session import get_spark, warm_udf_workers

cpus, sf, reps = 32, 1.0, 3
spark = get_spark(app_name="width_ab", master=f"local[{cpus}]", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
n_convs = max(300, int(1_800_000 * sf))
path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
spark.read.parquet(path).count()
warm_udf_workers(spark, spark.read.parquet(path), cpus)
aliases = alias_df(spark)
m_arrays = mention_arrays_from_turns(prepare_turns(spark.read.parquet(path))).cache()
m_arrays.agg(F.sum(F.size("norm_labels"))).collect()

def labels_run():
    normalized_labels_from_arrays(m_arrays, aliases).write.format("noop").mode("overwrite").save()

samples = {}
widths = ["16", "32", "64"]
for r in range(reps):
    rot = widths[r % len(widths):] + widths[:r % len(widths)]
    for w in rot:
        spark.conf.set("spark.sql.shuffle.partitions", w)
        t0 = time.time(); labels_run()
        samples.setdefault(w, []).append(round(time.time() - t0, 3))
print(json.dumps({"best": {k: min(v) for k, v in sorted(samples.items())}, "samples": samples}))
spark.stop()
