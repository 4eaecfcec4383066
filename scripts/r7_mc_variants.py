"""Round-7 mention_clusters A/B (guide §1): the shipped shape (lazy
explode of the cached per-turn arrays -> broadcast hash join against the
cluster-preimage dim) vs an in-array variant (filter each turn's label
array by a literal map of the same dim BEFORE exploding, derive
canon/cluster via element_at). Times the bench action (count) and the
full-row materialization (noop), fingerprint-checked on the full rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(os.environ.get("PROBE_CPUS", "32"))
    sf = float(os.environ.get("PROBE_SF", "1.0"))
    reps = int(os.environ.get("PROBE_REPS", "3"))

    from pyspark.sql import functions as F

    from session_graph_spark import corpus
    from session_graph_spark.operators.extract import explode_mention_arrays
    from session_graph_spark.plans.pipeline import (alias_df,
                                                    mention_arrays_from_turns,
                                                    normalized_labels_from_arrays,
                                                    prepare_turns)
    from session_graph_spark.operators.blocking import candidate_pairs
    from session_graph_spark.operators.cc import assign_clusters
    from session_graph_spark.operators.scoring import match_edges, score_pairs
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    spark = get_spark(app_name="r7_mc_variants", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    n_convs = max(300, int(1_800_000 * sf))
    path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    turns_df = spark.read.parquet(path)
    turns_df.count()
    warm_udf_workers(spark, turns_df, cpus)

    aliases = alias_df(spark)
    m_arrays = mention_arrays_from_turns(
        prepare_turns(spark.read.parquet(path))).cache()
    m_arrays.agg(F.sum(F.size("norm_labels"))).collect()
    mentions = explode_mention_arrays(m_arrays)
    labels = normalized_labels_from_arrays(m_arrays, aliases).cache()
    labels.count()
    pairs = candidate_pairs(labels, label_col="canon_label",
                            block_col="block_key")
    scored = score_pairs(pairs).cache()
    scored.count()
    clusters = assign_clusters(labels, match_edges(scored),
                               label_col="canon_label").cache()
    n_clusters = clusters.count()

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
    dim = dim_alias.unionByName(dim_direct)
    dim_rows = dim.collect()

    def cur():
        return (mentions.join(F.broadcast(dim), "norm_label")
                .select("conv_id", "turn_idx", "platform", "ts", "mention",
                        "norm_label", "mention_id", "pos", "canon_label",
                        "cluster_id"))

    dmap = F.create_map(*[
        x for r in dim_rows
        for x in (F.lit(r["norm_label"]),
                  F.struct(F.lit(r["canon_label"]).alias("c"),
                           F.lit(r["cluster_id"]).alias("g")))
    ])

    def invar():
        kept = F.filter(
            F.transform("norm_labels",
                        lambda x, i: F.struct(i.alias("pos"), x.alias("l"))),
            lambda s: F.map_contains_key(dmap, s["l"]),
        )
        out = m_arrays.select(
            "conv_id", "turn_idx", "platform", "ts",
            F.explode(kept).alias("s"),
        ).select(
            "conv_id", "turn_idx", "platform", "ts",
            F.col("s.l").alias("norm_label"), F.col("s.pos").alias("pos"),
        )
        hit = F.element_at(dmap, F.col("norm_label"))
        return out.select(
            "conv_id", "turn_idx", "platform", "ts",
            F.col("norm_label").alias("mention"),
            "norm_label",
            F.concat_ws("|", "conv_id", "turn_idx", "pos").alias("mention_id"),
            F.col("pos").cast("int").alias("pos"),
            hit["c"].alias("canon_label"),
            hit["g"].alias("cluster_id"),
        )

    def fingerprint(df):
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")),
                       F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], str(row["h"]))

    n_mentions = mentions.count()
    fa, fb = fingerprint(cur()), fingerprint(invar())
    eq = fa == fb
    if not eq:
        print(f"MISMATCH cur={fa} invar={fb}", file=sys.stderr)

    samples: dict[str, list[float]] = {}
    arms = {"cur_count": lambda: cur().count(),
            "invar_count": lambda: invar().count(),
            "cur_noop": lambda: cur().write.format("noop")
            .mode("overwrite").save(),
            "invar_noop": lambda: invar().write.format("noop")
            .mode("overwrite").save()}
    order = list(arms)
    for r in range(reps):
        rot = order[r % len(order):] + order[:r % len(order)]
        for name in rot:
            spark.sparkContext.setJobDescription(f"{name} rep {r}")
            t0 = time.time()
            arms[name]()
            samples.setdefault(name, []).append(round(time.time() - t0, 3))
    print(json.dumps({
        "cpus": cpus, "sf": sf, "equal": eq,
        "n_mentions": n_mentions, "n_mention_clusters": fa[0],
        "n_clusters": n_clusters, "dim_rows": len(dim_rows),
        "best": {k: min(v) for k, v in sorted(samples.items())},
        "samples": samples,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
