import json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from pyspark.sql import functions as F
from session_graph_spark import corpus
from session_graph_spark.plans.pipeline import (alias_df, mention_arrays_from_turns, prepare_turns)
from session_graph_spark.session import bench_shuffle_partitions, get_spark, warm_udf_workers

cpus, sf = 32, 1.0
spark = get_spark(app_name="mc_probe3", master=f"local[{cpus}]",
                  shuffle_partitions=bench_shuffle_partitions(cpus))
spark.sparkContext.setLogLevel("ERROR")
n_convs = max(300, int(1_800_000 * sf))
path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
spark.read.parquet(path).count()
warm_udf_workers(spark, spark.read.parquet(path), cpus)

t = prepare_turns(spark.read.parquet(path))
m_arrays = mention_arrays_from_turns(t).cache()
m_arrays.agg(F.sum(F.size("norm_labels"))).collect()

# stand-in dim: 330 plausible keys (content doesn't matter for cost shape)
keys = [r["norm_label"] for r in
        m_arrays.select(F.explode("norm_labels").alias("norm_label"))
        .groupBy("norm_label").count().orderBy(F.desc("count")).limit(330).collect()]
dim = spark.createDataFrame([(k,) for k in keys], "norm_label string")

exploded = m_arrays.select(F.explode("norm_labels").alias("norm_label"))
res = {}
def timed(name, fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.time(); fn(); dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    res[name] = round(best, 3)

timed("bhj", lambda: exploded.join(F.broadcast(dim), "norm_label").count())
timed("isin", lambda: exploded.where(F.col("norm_label").isin(keys)).count())

spark.conf.set("spark.sql.adaptive.enabled", "false")
timed("bhj_noaqe", lambda: exploded.join(F.broadcast(dim), "norm_label").count())
spark.conf.set("spark.sql.adaptive.enabled", "true")

spark.conf.set("spark.sql.codegen.wholeStage", "false")
timed("bhj_nocodegen", lambda: exploded.join(F.broadcast(dim), "norm_label").count())
spark.conf.set("spark.sql.codegen.wholeStage", "true")

# no Generate: materialize exploded rows, scan parquet -> join
ep = "/tmp/r7_exploded_probe"
if not os.path.exists(os.path.join(ep, "_SUCCESS")):
    exploded.write.mode("overwrite").parquet(ep)
flat = spark.read.parquet(ep)
flat.count()
timed("bhj_flat_scan", lambda: flat.join(F.broadcast(dim), "norm_label").count())
timed("isin_flat_scan", lambda: flat.where(F.col("norm_label").isin(keys)).count())
# semi join instead of inner
timed("bhj_semi", lambda: exploded.join(F.broadcast(dim), "norm_label", "left_semi").count())
print(json.dumps(res))
spark.stop()
