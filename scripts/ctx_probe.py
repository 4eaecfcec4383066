"""Decompose the ctx stage's wall time to find its parallelism-flat part.

The round-6 counted pool (scripts/ctx_stage_r6_counted.jsonl) shows
ctx_build nearly flat 1->4 cores (s+p fit: ~16s core-count-insensitive
out of ~22s). This probe times the stage's sub-plans separately at one
core count, optionally with AQE partition coalescing disabled, to
attribute the flat component before changing any plan:

  band   : cached-scan + preimage filter count
  distinct: + the (label, conv, turn) distinct shuffle
  sampled: + salted two-phase top-K windows
  ctx    : the full _mention_context materialization

Env: CPUS (default 4), COALESCE (1|0, default 1), SF (default 0.02),
     PLANT (default 300000), REPS (default 1).

The `distinct`/`sampled` sub-probes reconstruct the ROUND-5 salted
two-phase shape this probe was written to diagnose (and which round 6
then removed from _mention_context); `ctx_plan`/`ctx_count` time
whatever the production function currently plans. Diagnostic only -
never part of a counted gate pool.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from session_graph_spark import plans  # noqa: E402,F401
from session_graph_spark.plans import pipeline as P  # noqa: E402
from session_graph_spark.session import (bench_shuffle_partitions,  # noqa: E402
                                         get_spark, warm_udf_workers)


def main() -> None:
    cpus = int(os.environ.get("CPUS", "4"))
    coalesce = os.environ.get("COALESCE", "1") == "1"
    sf = float(os.environ.get("SF", "0.02"))
    plant_n = int(os.environ.get("PLANT", "300000"))
    reps = int(os.environ.get("REPS", "1"))

    from session_graph_spark import corpus

    n_convs = max(300, int(1_800_000 * sf))
    path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
    spark = get_spark(
        app_name="ctx_probe", master=f"local[{cpus}]",
        shuffle_partitions=bench_shuffle_partitions(cpus),
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.enabled":
                "true" if coalesce else "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        corpus.generate_turns_distributed(
            spark, n_convs=n_convs, seed=42, partitions=64
        ).write.mode("overwrite").parquet(path)
    warm_udf_workers(spark, spark.read.parquet(path), cpus)

    plant_labels = ["udsufbdqug", "odsufbqug", "mnbeubeoe", "enbeubweoe",
                    "mzhweuayywwyad", "azhweuayydwjyad",
                    "mwufcxljch", "ywufbxljch"]
    li = (F.col("id") % len(plant_labels)).cast("int")
    k = (F.col("id") / len(plant_labels)).cast("long")
    lab = F.element_at(F.array(*[F.lit(x) for x in plant_labels]), li + 1)
    plant = spark.range(plant_n * len(plant_labels), numPartitions=64).select(
        F.concat(F.lit("plant-"), li.cast("string"), F.lit("-"),
                 (k % 2000).cast("string")).alias("conv_id"),
        (k / 2000).cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        F.concat(lab, F.lit(" deploy pipeline with alphaflux and "
                            "betagrid today")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit("plant").alias("platform"),
        F.lit("plant.jsonl").alias("source_file"),
    )
    turns = P.prepare_turns(spark.read.parquet(path).unionByName(plant))
    aliases = P.alias_df(spark)
    mentions = P.mentions_from_turns(turns).cache()
    t0 = time.time()
    mentions.count()
    warm = round(time.time() - t0, 3)
    labels = P.normalized_labels(mentions, aliases, P.MIN_SESSIONS).cache()
    labels.count()
    wanted = spark.createDataFrame(
        [(x,) for x in plant_labels], "canon_label string")

    for rep in range(reps):
        out = {"cpus": cpus, "coalesce": coalesce, "plant": plant_n,
               "rep": rep, "extract_warm": warm}

        raw_m = mentions.select("conv_id", "turn_idx", "norm_label")
        band_raw = raw_m.where(F.col("norm_label").isin(plant_labels))
        band_m = P.apply_aliases(band_raw, aliases, label_col="norm_label",
                                 out_col="canon_label")
        t0 = time.time()
        out["band_rows"] = band_m.count()
        out["band"] = round(time.time() - t0, 3)

        dist = band_m.select("canon_label", "conv_id", "turn_idx").distinct()
        t0 = time.time()
        out["distinct_rows"] = dist.count()
        out["distinct"] = round(time.time() - t0, 3)

        from pyspark.sql import Window
        from session_graph_spark.functions.similarity import \
            CTX_EVIDENCE_TURNS
        sample_key = F.md5(F.concat_ws(
            "|", F.col("conv_id"), F.col("turn_idx").cast("string")))
        w1 = Window.partitionBy("canon_label", "__salt").orderBy(
            sample_key, "conv_id", "turn_idx")
        w2 = Window.partitionBy("canon_label").orderBy(
            sample_key, "conv_id", "turn_idx")
        sampled = (
            dist.withColumn("__salt",
                            F.pmod(F.xxhash64("conv_id", "turn_idx"),
                                   F.lit(64)))  # the removed r5 salt width
            .withColumn("__rk1", F.row_number().over(w1))
            .where(F.col("__rk1") <= CTX_EVIDENCE_TURNS)
            .withColumn("__rk", F.row_number().over(w2))
            .where(F.col("__rk") <= CTX_EVIDENCE_TURNS)
        )
        t0 = time.time()
        out["sampled_rows"] = sampled.count()
        out["sampled"] = round(time.time() - t0, 3)

        # production r6 shape: dense_rank group-limit straight off the
        # cached scan, no distinct, no salt
        prod = (
            band_m.select("canon_label", "conv_id", "turn_idx")
            .withColumn("__rk", F.dense_rank().over(w2))
            .where(F.col("__rk") <= CTX_EVIDENCE_TURNS)
        )
        t0 = time.time()
        out["sampled_prod_rows"] = prod.count()
        out["sampled_prod"] = round(time.time() - t0, 3)

        t0 = time.time()
        ctx = P._mention_context(mentions, aliases, labels, wanted)
        out["ctx_plan"] = round(time.time() - t0, 3)
        t0 = time.time()
        ctx.count()
        out["ctx_count"] = round(time.time() - t0, 3)
        ctx.unpersist()
        print(json.dumps(out), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
