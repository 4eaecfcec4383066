"""Bisect the gather pass's ~8s parallelism-flat cost (round 6,
amendment-4 post-mortem; see ctx_scan_ceiling.py): on the identical
cached frame, time the gather job under progressively simpler plans to
attribute the fixed cost to codegen compile, broadcast builds, cache
column width, or the aggregate.

Timings (in order, same JVM):
- g_cold   : the full gather plan (probe + aliases + semi + count_distinct
             agg), first run — pays codegen compile + broadcasts + scan.
- g_warm   : the SAME DataFrame counted again — codegen is cached, the
             broadcasts and scan re-execute. cold - warm ~= compile time.
- g_scan3  : probe-only over the same 3 cached columns (join + count, no
             aliases/semi/agg) — the scan + probe floor.
- g_scan1  : probe-only over 2 narrow columns (conv_id, turn_idx) — cache
             column-width sensitivity.

Env: BIS_CPUS (default 4), BIS_SF (0.02), BIS_PLANT (1200000).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(os.environ.get("BIS_CPUS", "4"))
    sf = float(os.environ.get("BIS_SF", "0.02"))
    plant_n = int(os.environ.get("BIS_PLANT", "1200000"))

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from session_graph_spark import corpus
    from session_graph_spark.functions.similarity import CTX_EVIDENCE_TURNS
    from session_graph_spark.plans import pipeline as P
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    n_convs = max(300, int(1_800_000 * sf))
    path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
    spark = get_spark(app_name="ctx_gather_bisect", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        corpus.generate_turns_distributed(
            spark, n_convs=n_convs, seed=42, partitions=64
        ).write.mode("overwrite").parquet(path)
    warm_udf_workers(spark, spark.read.parquet(path), cpus)

    pairs_banded = [("udsufbdqug", "odsufbqug"),
                    ("mnbeubeoe", "enbeubweoe"),
                    ("mzhweuayywwyad", "azhweuayydwjyad"),
                    ("mwufcxljch", "ywufbxljch")]
    band_surfaces = [x for p in pairs_banded for x in p]
    li = (F.col("id") % len(band_surfaces)).cast("int")
    k = (F.col("id") / len(band_surfaces)).cast("long")
    lab = F.element_at(F.array(*[F.lit(x) for x in band_surfaces]), li + 1)
    plant = spark.range(plant_n * len(band_surfaces), numPartitions=64).select(
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
    mentions.count()
    labels = P.normalized_labels(mentions, aliases, P.MIN_SESSIONS).cache()
    labels.count()

    raw_m = mentions.select("conv_id", "turn_idx", "norm_label")
    band_raw = raw_m.where(F.col("norm_label").isin(band_surfaces))
    band_m = P.apply_aliases(band_raw, aliases, label_col="norm_label",
                             out_col="canon_label")
    sample_key = F.md5(
        F.concat_ws("|", F.col("conv_id"), F.col("turn_idx").cast("string")))
    w2 = Window.partitionBy("canon_label").orderBy(
        sample_key, "conv_id", "turn_idx")
    sampled = (
        band_m.select("canon_label", "conv_id", "turn_idx")
        .withColumn("__rk", F.dense_rank().over(w2))
        .where(F.col("__rk") <= CTX_EVIDENCE_TURNS)
        .select(F.col("canon_label").alias("__band"), "conv_id", "turn_idx")
    ).cache()
    sampled.count()

    comp: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        comp[name] = round(time.time() - t0, 3)

    co = (
        P.apply_aliases(
            raw_m.join(F.broadcast(sampled), ["conv_id", "turn_idx"]),
            aliases, label_col="norm_label", out_col="canon_label")
        .join(F.broadcast(labels.select("canon_label")),
              "canon_label", "left_semi")
        .where(F.col("canon_label") != F.col("__band"))
        .select("__band", "conv_id", "turn_idx",
                F.col("canon_label").alias("ctx"))
        .groupBy("__band", "ctx")
        .agg(F.count_distinct("conv_id", "turn_idx").alias("n"))
    )
    timed("g_cold", co.count)
    timed("g_warm", co.count)

    probe3 = raw_m.join(
        F.broadcast(sampled.select("conv_id", "turn_idx")),
        ["conv_id", "turn_idx"])
    timed("g_scan3", probe3.count)
    probe1 = mentions.select("conv_id", "turn_idx").join(
        F.broadcast(sampled.select("conv_id", "turn_idx")),
        ["conv_id", "turn_idx"])
    timed("g_scan1", probe1.count)

    print(json.dumps({"cpus": cpus, "sf": sf, "plant": plant_n,
                      "bisect": comp}))
    spark.stop()


if __name__ == "__main__":
    main()
