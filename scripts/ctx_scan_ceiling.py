"""Decompose the ctx stage's 1v4 scaling into its physical components
(round 6, amendment-4 post-mortem): on the IDENTICAL cached mention frame
the counted pool used (CTX_SF=0.02, CTX_PLANT=1200000), time each
component of _mention_context separately plus a pure cached-scan ceiling
probe, at CEIL_CPUS cores.

Components, in plan order:
- cache_scan   : mentions.count() on the warm cache — the memory-bandwidth
                 ceiling for ANY pass over this frame; no plan can scale
                 better than this on one shared-memory VM.
- band_filter  : the sample pass's input (isin-preimage filter) counted.
- group_limit  : the full sampled subplan (dense_rank <= K group-limit).
- gather       : the gather pass (broadcast sample probe + canonicalize +
                 count_distinct agg + top-5 slice agg) — requires the
                 sample, so it is timed with the sampled frame pre-built.

Comparing per-component (T_1core / T_4core) / 4 against cache_scan's own
ratio attributes scaling loss: a component at or above the cache_scan
efficiency is AT the machine's scan ceiling (physics, not plan); one
below it owns a genuine serialization defect.

Env: CEIL_CPUS (default 4), CEIL_SF (default 0.02), CEIL_PLANT (default
1200000). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(os.environ.get("CEIL_CPUS", "4"))
    sf = float(os.environ.get("CEIL_SF", "0.02"))
    plant_n = int(os.environ.get("CEIL_PLANT", "1200000"))

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from session_graph_spark import corpus
    from session_graph_spark.functions.similarity import CTX_EVIDENCE_TURNS
    from session_graph_spark.plans import pipeline as P
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    n_convs = max(300, int(1_800_000 * sf))
    path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
    spark = get_spark(app_name="ctx_scan_ceiling", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        corpus.generate_turns_distributed(
            spark, n_convs=n_convs, seed=42, partitions=64
        ).write.mode("overwrite").parquet(path)
    warm_udf_workers(spark, spark.read.parquet(path), cpus)

    # identical plant construction to stage_scaling.py (same pairs, same
    # conv/turn layout) so the cached frame matches the counted pool's
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
    mentions.count()  # populate the cache OUTSIDE any timed region

    comp: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        comp[name] = round(time.time() - t0, 3)

    raw_m = mentions.select("conv_id", "turn_idx", "norm_label")

    # ceiling: one full warm-cache pass, trivial aggregate
    timed("cache_scan", mentions.count)

    # sample pass input: the pushed-down preimage filter (band surfaces
    # are their own canonicals here: none of the synthetic labels appear
    # in the alias dimension)
    band_raw = raw_m.where(F.col("norm_label").isin(band_surfaces))
    timed("band_filter", band_raw.count)

    # the full sampled subplan exactly as _mention_context builds it
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
    timed("group_limit", sampled.count)

    # gather pass on the pre-built sample: the second corpus-sized scan
    labels_dim = (band_m.select("canon_label").distinct()
                  .unionByName(
                      mentions.select(
                          F.col("norm_label").alias("canon_label"))
                      .distinct()).distinct().cache())
    labels_dim.count()
    co = (
        P.apply_aliases(
            raw_m.join(F.broadcast(sampled), ["conv_id", "turn_idx"]),
            aliases, label_col="norm_label", out_col="canon_label")
        .join(F.broadcast(labels_dim), "canon_label", "left_semi")
        .where(F.col("canon_label") != F.col("__band"))
        .select("__band", "conv_id", "turn_idx",
                F.col("canon_label").alias("ctx"))
        .groupBy("__band", "ctx")
        .agg(F.count_distinct("conv_id", "turn_idx").alias("n"))
    )
    timed("gather", co.count)

    print(json.dumps({"cpus": cpus, "sf": sf, "plant": plant_n,
                      "components": comp}))
    spark.stop()


if __name__ == "__main__":
    main()
