import json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from pyspark.sql import functions as F
from session_graph_spark import corpus
from session_graph_spark.functions.filters import is_valid_entity_col
from session_graph_spark.operators.extract import (
    EXTRACT_INPUT_MAX_CHARS, MAX_MENTIONS_PER_TURN, _M1, _M2,
    _MARKER_EXTRACT, _MARKER_OR_WS, _PHRASE_RE)
from session_graph_spark.plans.pipeline import prepare_turns
from session_graph_spark.session import bench_shuffle_partitions, get_spark, warm_udf_workers

cpus, sf, reps = 32, 1.0, 3
spark = get_spark(app_name="split_ab", master=f"local[{cpus}]",
                  shuffle_partitions=bench_shuffle_partitions(cpus))
spark.sparkContext.setLogLevel("ERROR")
n_convs = max(300, int(1_800_000 * sf))
path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
spark.read.parquet(path).count()
warm_udf_workers(spark, spark.read.parquet(path), cpus)
java_re = _PHRASE_RE.pattern
lower_text = F.lower(F.substring("text", 1, EXTRACT_INPUT_MAX_CHARS))
WS_FIRST = rf"\s+|{_M1}[^{_M2}]*{_M2}"

def head(split_pat):
    t = prepare_turns(spark.read.parquet(path))
    t = t.where((F.col("role") == "assistant") & (F.length(F.trim(F.col("text"))) >= 30))
    t = t.select("conv_id", "turn_idx", "platform", "ts", "text")
    t = t.select("conv_id", "turn_idx", "platform", "ts",
                 F.regexp_replace(lower_text, java_re, f"{_M1}$1{_M2}").alias("resid")
                 ).withColumn("ph", F.regexp_extract_all("resid", F.lit(_MARKER_EXTRACT), 1))
    toks = F.filter(F.split("resid", split_pat), lambda x: x != "")
    cands = F.concat("ph", toks)
    n_ph = F.size("ph")
    normed = F.transform(cands, lambda x: F.rtrim(x, F.lit(".,;:")))
    kept = F.filter(normed, lambda x, i: (i < n_ph) | is_valid_entity_col(x))
    deduped = F.slice(F.array_distinct(kept), 1, MAX_MENTIONS_PER_TURN)
    return t.select("conv_id", "turn_idx", "platform", "ts", deduped.alias("norm_labels"))

def fp(df):
    r = df.agg(F.count("*").alias("n"),
               F.coalesce(F.sum(F.xxhash64("conv_id","turn_idx",
                   F.concat_ws("\x00","norm_labels")).cast("decimal(38,0)")),F.lit(0)).alias("h")).collect()[0]
    return (r["n"], str(r["h"]))
fa, fb = fp(head(_MARKER_OR_WS)), fp(head(WS_FIRST))
eq = fa == fb
variants = {"cur": lambda: head(_MARKER_OR_WS), "ws_first": lambda: head(WS_FIRST)}
samples = {}
order = list(variants)
for r in range(reps):
    rot = order[r % 2:] + order[:r % 2]
    for name in rot:
        t0 = time.time()
        variants[name]().write.format("noop").mode("overwrite").save()
        samples.setdefault(name, []).append(round(time.time() - t0, 3))
print(json.dumps({"equal": eq, "best": {k: min(v) for k, v in samples.items()}, "samples": samples}))
spark.stop()
