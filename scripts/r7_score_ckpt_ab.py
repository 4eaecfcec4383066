import json, os, sys, tempfile, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from pyspark.sql import functions as F
from session_graph_spark import corpus
from session_graph_spark.plans.pipeline import (alias_df, mention_arrays_from_turns,
    normalized_labels_from_arrays, prepare_turns)
from session_graph_spark.operators.blocking import candidate_pairs
from session_graph_spark.operators.scoring import PAIR_KEY, score_pairs
from session_graph_spark.functions.similarity import pair_score
from session_graph_spark.session import bench_shuffle_partitions, get_spark, warm_udf_workers

cpus, sf, reps = 32, 1.0, 4
spark = get_spark(app_name="score_ab", master=f"local[{cpus}]",
                  shuffle_partitions=bench_shuffle_partitions(cpus))
spark.sparkContext.setLogLevel("ERROR")
n_convs = max(300, int(1_800_000 * sf))
path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
spark.read.parquet(path).count()
warm_udf_workers(spark, spark.read.parquet(path), cpus)
aliases = alias_df(spark)
m_arrays = mention_arrays_from_turns(prepare_turns(spark.read.parquet(path))).cache()
m_arrays.agg(F.sum(F.size("norm_labels"))).collect()
labels = normalized_labels_from_arrays(m_arrays, aliases).cache(); labels.count()
stage_pairs = candidate_pairs(labels, label_col="canon_label", block_col="block_key")
dec_path = os.path.join(tempfile.gettempdir(), "r7_score_ab_dec")
score_pairs(stage_pairs).select("label_a","label_b","score").write.mode("overwrite").parquet(dec_path)
dec = spark.read.parquet(dec_path)

def cur():
    return score_pairs(stage_pairs, decisions=dec)

def ckpt():
    p = stage_pairs.localCheckpoint(eager=False)
    cached = dec.join(p, PAIR_KEY, "left_semi")
    fresh = p.join(dec, PAIR_KEY, "left_anti")
    scored = fresh.withColumn("score", pair_score(F.col("label_a"), F.col("label_b")))
    return scored.unionByName(cached.select("label_a", "label_b", "score"))

def fp(df):
    r = df.agg(F.count("*").alias("n"),
               F.coalesce(F.sum(F.xxhash64("label_a","label_b",
                   F.round("score", 9).cast("string")).cast("decimal(38,0)")), F.lit(0)).alias("h")
               ).collect()[0]
    return (r["n"], str(r["h"]))
fa, fb = fp(cur()), fp(ckpt())
eq = fa == fb
variants = {"cur": cur, "ckpt": ckpt}
samples = {}
order = list(variants)
for r in range(reps):
    rot = order[r % 2:] + order[:r % 2]
    for name in rot:
        t0 = time.time(); variants[name]().count()
        samples.setdefault(name, []).append(round(time.time() - t0, 3))
print(json.dumps({"equal": eq, "fa": fa, "fb": fb,
                  "best": {k: min(v) for k, v in sorted(samples.items())}, "samples": samples}))
spark.stop()
