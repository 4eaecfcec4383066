"""Supplementary benchmarks (round 7). bench.py is FROZEN for driver
measurement; the standing scale-evidence rows the round-6 verdict asked
for live here instead. Prints ONE JSON line:

  {"metric": "bench_extra_sec", "queries": {...}, ...}

Rows:
  skew_spread / skew_hot   — the full ER headline over the sf corpus plus
      a planted load of PLANT_N extra turns: `spread` plants 64 moderate
      labels, `hot` plants ONE canonical label carrying the same total
      occurrence volume (~15%% of all mentions at the default plant; the
      filler words are stopwords, so the planted label is each planted
      turn's only surviving mention and both arms stress extraction
      identically). Both corpora have
      identical size and shape; only key skew differs. The pipeline's
      skew posture (blocking/scoring over DISTINCT labels, conv-keyed
      label aggregation, broadcast-only occurrence joins) predicts a
      ratio near 1.0; >1.5 would mean a hidden single-task stage.
  fed_curated / fed_ext30k — the 6 federated templates (the composite
      kb_federation row's exact work) at the curated snapshot dim and at
      +30k generated remote entities (the fused-name space caps at ~39k): every remote side is broadcast, so
      time must stay flat in dim size (extension is bench-only; it never
      reaches the oracle row — see ADVICE r6 / federation.py).
  inc_merge_state01 / inc_merge_state03 — merge a batch of K_NEW new + 1
      changed conversation into a state store built from an sf0.1-scale
      vs an sf0.3-scale corpus. Flat per-batch time across state sizes
      is the O(batch + touched partitions) claim of the partition-pruned
      merge (incremental.py), driver-visible the same way kb_link_*
      pinned KB-size flatness.

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py),
EXTRA_PLANT_N (default 2,000,000), EXTRA_K_NEW (default 100),
EXTRA_ONLY (comma list of row prefixes to run).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    plant_n = int(os.environ.get("EXTRA_PLANT_N", "2000000"))
    k_new = int(os.environ.get("EXTRA_K_NEW", "100"))
    only = set(os.environ.get("EXTRA_ONLY", "").split(",")) - {""}
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    from pyspark.sql import functions as F

    from session_graph_spark import corpus
    from session_graph_spark.plans.pipeline import prepare_turns, resolve
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    n_convs = max(300, int(1_800_000 * sf))
    turns_path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
    if not os.path.exists(os.path.join(turns_path, "_SUCCESS")):
        corpus.generate_turns_distributed(spark, n_convs=n_convs, seed=42,
                                          partitions=64).write.mode(
            "overwrite").parquet(turns_path)
    base_turns = spark.read.parquet(turns_path)
    base_turns.count()
    warm_udf_workers(spark, base_turns, cpus)
    # full-plan warmup, as bench.py does
    w = resolve(spark, corpus.generate_turns(spark, n_convs=300, seed=7))
    w.mention_clusters.count()
    w.unpersist()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    extras: dict = {}

    def timed(name, fn, reps=2):
        best = None
        for _ in range(max(reps, 1)):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fn()
            best = min(time.time() - t0, best or 1e9)
        timings[name] = round(best, 3)

    def want(prefix):
        return not only or any(o.startswith(prefix) for o in only)

    # ---- skew stress -----------------------------------------------------
    if want("skew"):
        def plant(hot: bool):
            # conv layout: 2000 planted conversations, turns round-robin.
            # label: ONE canonical for the hot arm; 64 moderate labels
            # (each still >= min_sessions convs) for the spread arm.
            k = F.col("id")
            ci = (k % 2000).cast("int")
            label = (F.lit("skewhotzq") if hot else
                     F.concat(F.lit("skewcoldzq"), (k % 64).cast("string")))
            return spark.range(plant_n, numPartitions=64).select(
                F.concat(F.lit("skew-"), ci.cast("string")).alias("conv_id"),
                (k / 2000).cast("int").alias("turn_idx"),
                F.lit("assistant").alias("role"),
                F.concat(label, F.lit(" is the and of with for to in that "
                                      "it")).alias("text"),
                F.lit(None).cast("string").alias("tool"),
                F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
                F.lit("plant").alias("platform"),
                F.lit("/projects/p0/plant.jsonl").alias("source_file"),
            )

        def run_arm(hot: bool):
            spark.catalog.clearCache()
            res = resolve(spark, base_turns.unionByName(plant(hot)))
            res.clusters.count()
            res.mention_clusters.count()
            res.unpersist()

        timed("skew_spread", lambda: run_arm(False))
        timed("skew_hot", lambda: run_arm(True))
        extras["skew_ratio"] = round(
            timings["skew_hot"] / timings["skew_spread"], 3)
        # measured occurrence share of the hot label
        res = resolve(spark, base_turns.unionByName(plant(True)))
        n_all = res.mentions.count()
        n_hot = res.mentions.where(
            F.col("norm_label") == "skewhotzq").count()
        res.unpersist()
        spark.catalog.clearCache()
        extras["skew_hot_share"] = round(n_hot / n_all, 4)

    # ---- federation dim-size flatness -----------------------------------
    if want("fed"):
        from session_graph_spark.operators import federation as FD
        from session_graph_spark.sources.testdata import doc_tokens

        def fed_all(extra_n: int):
            r = FD.remote_dfs(spark, extra_n=extra_n)
            linked = FD.same_as(
                doc_tokens(spark, sf_dir).select(F.col("token").alias("label")),
                r["entities"])
            for fn in (FD.fed_properties, FD.fed_peers,
                       FD.fed_disambiguation, FD.fed_categories,
                       FD.fed_bridge, FD.fed_batch_enrich):
                fn(linked, r).write.format("noop").mode("overwrite").save()

        timed("fed_curated", lambda: fed_all(0))
        timed("fed_ext30k", lambda: fed_all(30_000))

    # ---- incremental merge flatness -------------------------------------
    if want("inc"):
        from session_graph_spark.streaming.incremental import IncrementalRunner

        def batch_turns():
            # K_NEW brand-new conversations (disjoint ids) + 1 changed
            new = (corpus.generate_turns(spark, n_convs=k_new, seed=7)
                   .withColumn("conv_id", F.concat(F.lit("newb-"), "conv_id")))
            one = base_turns.join(
                base_turns.select("conv_id").distinct().orderBy("conv_id")
                .limit(1), "conv_id", "left_semi")
            changed = one.withColumn(
                "text", F.concat("text", F.lit(" changedmarkerzz")))
            return new.unionByName(changed)

        for tag, state_sf in (("state01", 0.1), ("state03", 0.3)):
            nc = max(300, int(1_800_000 * state_sf))
            cpath = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(nc, 42)}"
            if not os.path.exists(os.path.join(cpath, "_SUCCESS")):
                corpus.generate_turns_distributed(
                    spark, n_convs=nc, seed=42, partitions=64
                ).write.mode("overwrite").parquet(cpath)
            state_dir = f"/tmp/r7_inc_{tag}"
            shutil.rmtree(state_dir, ignore_errors=True)
            runner = IncrementalRunner(spark, state_dir)
            t0 = time.time()
            runner.run(spark.read.parquet(cpath))
            extras[f"inc_build_{tag}"] = round(time.time() - t0, 3)
            spark.catalog.clearCache()
            bt = batch_turns().localCheckpoint(eager=True)
            spark.sparkContext.setJobDescription(f"inc_merge_{tag}")
            t0 = time.time()
            runner.run(bt)
            timings[f"inc_merge_{tag}"] = round(time.time() - t0, 3)
            spark.catalog.clearCache()

    print(json.dumps({
        "metric": "bench_extra_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec", "queries": timings, "sf": sf, "cpus": cpus,
        **extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
