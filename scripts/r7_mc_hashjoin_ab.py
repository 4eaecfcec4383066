import json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from pyspark.sql import functions as F
from session_graph_spark import corpus
from session_graph_spark.operators.extract import explode_mention_arrays
from session_graph_spark.plans.pipeline import (alias_df, mention_arrays_from_turns,
    normalized_labels_from_arrays, prepare_turns)
from session_graph_spark.operators.blocking import candidate_pairs
from session_graph_spark.operators.scoring import match_edges, score_pairs
from session_graph_spark.operators.cc import assign_clusters
from session_graph_spark.session import bench_shuffle_partitions, get_spark, warm_udf_workers

cpus, sf, reps = 32, 1.0, 3
spark = get_spark(app_name="mc_hash_ab", master=f"local[{cpus}]",
                  shuffle_partitions=bench_shuffle_partitions(cpus))
spark.sparkContext.setLogLevel("ERROR")
n_convs = max(300, int(1_800_000 * sf))
path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
spark.read.parquet(path).count()
warm_udf_workers(spark, spark.read.parquet(path), cpus)

aliases = alias_df(spark)
t = prepare_turns(spark.read.parquet(path))
m_arrays = mention_arrays_from_turns(t).cache()
mentions = explode_mention_arrays(m_arrays)
m_arrays.agg(F.sum(F.size("norm_labels"))).collect()
labels = normalized_labels_from_arrays(m_arrays, aliases).cache(); labels.count()
pairs = candidate_pairs(labels, label_col="canon_label", block_col="block_key")
scored = score_pairs(pairs).cache(); scored.count()
clusters = assign_clusters(labels, match_edges(scored), label_col="canon_label").cache()
clusters.count()
cl = clusters.select(F.col("label").alias("canon_label"), "cluster_id")
dim_alias = (aliases.select(F.col("surface").alias("norm_label"),
                            F.col("canonical").alias("canon_label"))
             .join(cl, "canon_label").select("norm_label", "canon_label", "cluster_id"))
dim_direct = (cl.withColumn("norm_label", F.col("canon_label"))
              .join(aliases.select(F.col("surface").alias("norm_label")), "norm_label", "left_anti")
              .select("norm_label", "canon_label", "cluster_id"))
dim = dim_alias.unionByName(dim_direct)

OUT = ["conv_id", "turn_idx", "platform", "ts", "mention",
       "norm_label", "mention_id", "pos", "canon_label", "cluster_id"]

def cur():
    return mentions.join(F.broadcast(dim), "norm_label").select(*OUT)

def hashed():
    d = (dim.withColumnRenamed("norm_label", "__dim_label")
            .withColumn("__k", F.xxhash64("__dim_label")))
    return (mentions.withColumn("__k", F.xxhash64("norm_label"))
            .join(F.broadcast(d), "__k")
            .where(F.col("norm_label") == F.col("__dim_label"))
            .select(*OUT))

def fp(df):
    r = df.agg(F.count("*").alias("n"),
               F.coalesce(F.sum(F.xxhash64(*OUT).cast("decimal(38,0)")), F.lit(0)).alias("h")
               ).collect()[0]
    return (r["n"], str(r["h"]))

fa, fb = fp(cur()), fp(hashed())
eq = fa == fb
variants = {"cur": cur, "hashed": hashed}
samples = {}
order = list(variants)
for r in range(reps):
    rot = order[r % 2:] + order[:r % 2]
    for name in rot:
        t0 = time.time()
        variants[name]().write.format("noop").mode("overwrite").save()
        samples.setdefault(name, []).append(round(time.time() - t0, 3))
        t0 = time.time()
        variants[name]().count()
        samples.setdefault(name + "_cnt", []).append(round(time.time() - t0, 3))
print(json.dumps({"equal": eq, "fa": fa, "fb": fb,
                  "best": {k: min(v) for k, v in sorted(samples.items())},
                  "samples": samples}))
spark.stop()
