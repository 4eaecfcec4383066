import json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from pyspark.sql import functions as F
from session_graph_spark.session import bench_shuffle_partitions, get_spark

cpus = 32
spark = get_spark(app_name="mc_probe4", master=f"local[{cpus}]",
                  shuffle_partitions=bench_shuffle_partitions(cpus))
spark.sparkContext.setLogLevel("ERROR")
flat = spark.read.parquet("/tmp/r7_exploded_probe").cache()
n = flat.count()
keys = [r["norm_label"] for r in
        flat.groupBy("norm_label").count().orderBy(F.desc("count")).limit(330).collect()]
dim = spark.createDataFrame([(k,) for k in keys], "norm_label string")
dim1 = spark.createDataFrame([(keys[0],)], "norm_label string")
dim_long = spark.createDataFrame([(k,) for k in keys], "norm_label string") \
    .select(F.xxhash64("norm_label").alias("k"))
flat_long = flat.select(F.xxhash64("norm_label").alias("k"))

res = {"n": n}
def timed(name, fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.time(); fn(); dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    res[name] = round(best, 3)

timed("count_only", flat.count)
timed("bhj_330", lambda: flat.join(F.broadcast(dim), "norm_label").count())
timed("bhj_1row", lambda: flat.join(F.broadcast(dim1), "norm_label").count())
timed("bhj_long", lambda: flat_long.join(F.broadcast(dim_long), "k").count())
timed("isin_330", lambda: flat.where(F.col("norm_label").isin(keys)).count())
print(json.dumps(res))
spark.stop()
