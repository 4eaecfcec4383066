"""Attribute the er_pipeline parallelism-flat floor to individual driver
actions (round 6): run the bench headline's exact action sequence at one
parallelism level, timing EACH sequential Spark action separately, in one
process. Run twice (FLOOR_CPUS=1, FLOOR_CPUS=4) back-to-back to compare
the same VM noise window.

The per-stage harness (stage_scaling.py) times stages in isolation and
reads 0.92+ efficiency on its total, while the bench's end-to-end
er_pipeline reads ~0.79 — the gap is the flat cost of the sequential
action chain between/around the attributed stages (job scheduling, eager
checkpoints, driver collects, small materialization jobs). This script
measures that chain directly.

Prints one JSON line: {"cpus": N, "actions": {name: sec, ...},
"total": sec} — `actions` in execution order.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(os.environ.get("FLOOR_CPUS", "4"))
    sf = float(os.environ.get("FLOOR_SF", "0.1"))

    from session_graph_spark import corpus
    from session_graph_spark.functions.similarity import pair_score
    from session_graph_spark.operators.blocking import candidate_pairs
    from session_graph_spark.operators.cc import assign_clusters
    from session_graph_spark.operators.scoring import (band_labels,
                                                       match_edges,
                                                       score_pairs)
    from session_graph_spark.plans.pipeline import (_mention_context,
                                                    alias_df,
                                                    mentions_from_turns,
                                                    normalized_labels,
                                                    prepare_turns)
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    spark = get_spark(app_name="floor_profile", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    n_convs = max(300, int(1_800_000 * sf))
    path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
    assert os.path.exists(os.path.join(path, "_SUCCESS")), "pregen corpus first"
    turns_df = spark.read.parquet(path)
    turns_df.count()
    warm_udf_workers(spark, turns_df, cpus)
    # same full-plan warmup as bench.py
    from session_graph_spark.plans.pipeline import resolve
    w = resolve(spark, corpus.generate_turns(spark, n_convs=300, seed=7))
    w.mention_clusters.count()
    w.unpersist()
    spark.catalog.clearCache()

    actions: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        actions[name] = round(time.time() - t0, 3)
        return out

    aliases = alias_df(spark)
    t = prepare_turns(spark.read.parquet(path))
    # r7: mirror resolve()'s fast path — cache the per-turn arrays,
    # mentions is a lazy explode of the cache
    from pyspark.sql import functions as F

    from session_graph_spark.operators.extract import explode_mention_arrays
    from session_graph_spark.plans.pipeline import mention_arrays_from_turns
    m_arrays = mention_arrays_from_turns(t).cache()
    mentions = explode_mention_arrays(m_arrays)
    timed("mentions_count",
          lambda: m_arrays.agg(F.sum(F.size("norm_labels"))).collect())
    from session_graph_spark.plans.pipeline import normalized_labels_from_arrays
    labels = normalized_labels_from_arrays(m_arrays, aliases).cache()
    timed("labels_count", labels.count)
    pairs = candidate_pairs(labels, label_col="canon_label",
                            block_col="block_key")
    # score_pairs internals, split into its sequential actions
    from pyspark.sql import functions as F
    kernel = pairs.withColumn(
        "score", pair_score(F.col("label_a"), F.col("label_b")))
    kernel = timed("kernel_localCheckpoint",
                   lambda: kernel.localCheckpoint(eager=True))
    wanted = band_labels(kernel)
    ctx = timed("band_probe_and_ctx",
                lambda: _mention_context(mentions, aliases, labels, wanted))
    scored = kernel if ctx is None else None
    if scored is None:
        from session_graph_spark.operators.scoring import apply_context_bonus
        scored = apply_context_bonus(kernel, ctx)
    scored = scored.cache()
    timed("scored_count", scored.count)
    edges = match_edges(scored)
    clusters = assign_clusters(labels, edges, label_col="canon_label").cache()
    timed("clusters_count", clusters.count)
    # r7 single-probe shape (mirrors resolve)
    cl = clusters.select(F.col("label").alias("canon_label"), "cluster_id")
    dim_alias = (
        aliases.select(F.col("surface").alias("norm_label"),
                       F.col("canonical").alias("canon_label"))
        .join(cl, "canon_label")
        .select("norm_label", "canon_label", "cluster_id")
    )
    dim_direct = (
        cl.withColumn("norm_label", F.col("canon_label"))
        .join(aliases.select(F.col("surface").alias("norm_label")),
              "norm_label", "left_anti")
        .select("norm_label", "canon_label", "cluster_id")
    )
    mc = (mentions.join(F.broadcast(dim_alias.unionByName(dim_direct)),
                        "norm_label")
          .select("conv_id", "turn_idx", "platform", "ts", "mention",
                  "norm_label", "mention_id", "pos", "canon_label",
                  "cluster_id"))
    timed("mention_clusters_count", mc.count)

    print(json.dumps({"cpus": cpus, "sf": sf, "actions": actions,
                      "total": round(sum(actions.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
