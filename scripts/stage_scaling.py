"""Per-stage scaling attribution for the headline ER pipeline.

Replays resolve()'s fast path stage by stage (extract -> labels ->
score[kernel+context] -> CC -> mention join) with a timer around each
materialization, at SPARK_GRAFT_CPUS cores, and prints one JSON line of
per-stage seconds. Comparing the vectors at local[1] vs local[4]
attributes scaling loss to the stage that owns it (Amdahl serial time
vs bandwidth-bound parallel stages).

Env: SPARK_GRAFT_CPUS (default 4), SPARK_GRAFT_STAGE_SF (default 0.1 =
the 180k-conv / 2.52M-turn bench corpus), SPARK_GRAFT_STAGE_REPS
(default 1, best-of across reps).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    sf = float(os.environ.get("SPARK_GRAFT_STAGE_SF", "0.1"))
    reps = int(os.environ.get("SPARK_GRAFT_STAGE_REPS", "1"))

    from session_graph_spark import corpus
    from session_graph_spark.operators.blocking import candidate_pairs
    from session_graph_spark.operators.cc import assign_clusters
    from session_graph_spark.operators.scoring import (band_labels,
                                                       match_edges,
                                                       score_pairs)
    from session_graph_spark.plans import pipeline as P
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    n_convs = max(300, int(1_800_000 * sf))
    path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
    spark = get_spark(app_name="stage_scaling", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        corpus.generate_turns_distributed(
            spark, n_convs=n_convs, seed=42, partitions=64
        ).write.mode("overwrite").parquet(path)
    warm_udf_workers(spark, spark.read.parquet(path), cpus)

    # SPARK_GRAFT_STAGE_PLANT=<turns per label>: union synthetic turns
    # containing VARIANT-SHAPED kernel-band pairs (kernel in [0.62, 0.7),
    # lev_ratio >= 0.8 — verified below) so the context stage actually
    # RUNS: the bench corpus has no variant-shaped band pair, so the
    # round-5 band pruning short-circuits ctx_build there and its salted
    # top-K path has never been measured under load (VERDICT r5 #6).
    # Each label appears in 2,000 conversations (passes min_sessions)
    # with shared co-mention words, so the full sample -> vector ->
    # bonus path is live.
    plant_n = int(os.environ.get("SPARK_GRAFT_STAGE_PLANT", "0"))

    def read_turns():
        t = spark.read.parquet(path)
        if not plant_n:
            return t
        from pyspark.sql import functions as F

        from session_graph_spark.functions.similarity import (combined_score,
                                                              levenshtein_ratio)

        pairs_banded = [("udsufbdqug", "odsufbqug"),
                        ("mnbeubeoe", "enbeubweoe"),
                        ("mzhweuayywwyad", "azhweuayydwjyad"),
                        ("mwufcxljch", "ywufbxljch")]
        for a, b in pairs_banded:
            ks, lev = combined_score(a, b), levenshtein_ratio(a, b)
            assert 0.62 <= ks < 0.70 and lev >= 0.8, (a, b, ks, lev)
        labels = [x for p in pairs_banded for x in p]
        li = (F.col("id") % len(labels)).cast("int")
        k = (F.col("id") / len(labels)).cast("long")
        lab = F.element_at(F.array(*[F.lit(x) for x in labels]), li + 1)
        plant = spark.range(plant_n * len(labels), numPartitions=64).select(
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
        return t.unionByName(plant)

    best: dict[str, float] = {}
    for _ in range(reps):
        spark.catalog.clearCache()
        aliases = P.alias_df(spark)
        stages: dict[str, float] = {}
        t_all = time.time()

        def timed(name, fn):
            t0 = time.time()
            out = fn()
            stages[name] = round(time.time() - t0, 3)
            return out

        turns = P.prepare_turns(read_turns())
        mentions = P.mentions_from_turns(turns).cache()
        timed("extract", mentions.count)
        labels = P.normalized_labels(mentions, aliases, P.MIN_SESSIONS).cache()
        timed("labels", labels.count)
        pairs = candidate_pairs(labels, label_col="canon_label",
                                block_col="block_key")
        ctx_holder: list = []

        def _ctx_builder(scored_fresh):
            t0 = time.time()
            ctx = P._mention_context(mentions, aliases, labels,
                                     band_labels(scored_fresh))
            stages["ctx_plan"] = round(time.time() - t0, 3)
            t1 = time.time()
            if ctx is not None:
                ctx_holder.append(ctx)
                ctx.count()
            stages["ctx_count"] = round(time.time() - t1, 3)
            stages["ctx_build"] = round(time.time() - t0, 3)
            return ctx

        scored = score_pairs(pairs, context_builder=_ctx_builder).cache()
        timed("score_total", scored.count)  # kernel + ckpt + ctx + bonus
        clusters = timed("cc", lambda: assign_clusters(
            labels, match_edges(scored), label_col="canon_label").cache())
        timed("cc_count", clusters.count)
        mc = (P.apply_aliases(mentions, aliases, label_col="norm_label",
                              out_col="canon_label")
              .join(clusters, P.F.col("canon_label") == P.F.col("label"))
              .drop("label"))
        timed("mention_join", lambda: mc.count())
        stages["total"] = round(time.time() - t_all, 3)
        for k, v in stages.items():
            best[k] = min(best.get(k, 1e9), v)
        for df in [mentions, labels, scored, clusters] + ctx_holder:
            df.unpersist()

    print(json.dumps({"cpus": cpus, "sf": sf, "n_convs": n_convs,
                      "stages": best}))
    spark.stop()


if __name__ == "__main__":
    main()
