"""Round-7 labels-stage variant A/B (interleaved, one JVM):

  cur  — shipped normalized_labels over exploded mentions: broadcast
         alias probe on every mention row (112M at sf1.0) + two-phase
         exact countDistinct keyed (canon_label, conv_id)
  arr  — aggregate the CACHED per-turn arrays by conv_id (collect_list
         of arrays: one append per turn, 11M rows), flatten + in-array
         dedup + in-array alias map lookup + dedup per conv, explode
         the per-conv distinct canon set, then count(*) per label ==
         countDistinct(conv_id) because each conv contributes each
         canonical at most once. Kills the per-mention probe AND the
         (canon, conv)-keyed exchange.

Fingerprint equality of the full labels output is asserted; timing is
interleaved best-of.
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
    from session_graph_spark.data import alias_rows
    from session_graph_spark.functions.filters import is_linkable_entity
    from session_graph_spark.functions.normalize import slug
    from session_graph_spark.operators.extract import explode_mention_arrays
    from session_graph_spark.plans.pipeline import (alias_df,
                                                    mention_arrays_from_turns,
                                                    normalized_labels,
                                                    prepare_turns)
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    spark = get_spark(app_name="r7_labels_variants", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    n_convs = max(300, int(1_800_000 * sf))
    path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
    turns_df = spark.read.parquet(path)
    turns_df.count()
    warm_udf_workers(spark, turns_df, cpus)

    aliases = alias_df(spark)
    arr = mention_arrays_from_turns(prepare_turns(turns_df)).cache()
    m = explode_mention_arrays(arr)
    m.count()

    amap = F.create_map(*[F.lit(x) for pair in alias_rows() for x in pair])

    def labels_arr():
        per_conv = arr.groupBy("conv_id").agg(
            F.flatten(F.collect_list("norm_labels")).alias("ls"))
        canon_set = F.array_distinct(F.transform(
            F.array_distinct("ls"),
            lambda x: F.coalesce(F.element_at(amap, x), x)))
        counts = (
            per_conv.select(F.explode(canon_set).alias("canon_label"))
            .groupBy("canon_label").agg(F.count("*").alias("n_sessions"))
            .where(F.col("n_sessions") >= 2)
        )
        canon_dim = F.broadcast(
            aliases.select(F.col("canonical").alias("canon_label")).distinct()
            .withColumn("__is_canon", F.lit(True))
        )
        counts = (
            counts.join(canon_dim, "canon_label", "left")
            .where(is_linkable_entity(F.col("canon_label"))
                   | F.col("__is_canon").isNotNull())
            .drop("__is_canon")
        )
        return counts.withColumn("block_key", slug("canon_label"))

    def fp(df):
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.xxhash64("canon_label", "n_sessions",
                                        "block_key").cast("decimal(38,0)")),
                       F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], str(row["h"]))

    f_cur = fp(normalized_labels(m, aliases))
    f_arr = fp(labels_arr())
    eq = f_cur == f_arr

    samples: dict[str, list[float]] = {}

    def timed(name, fn):
        spark.sparkContext.setJobDescription(f"labels variant {name}")
        t0 = time.time()
        fn().count()
        dt = time.time() - t0
        samples.setdefault(name, []).append(round(dt, 3))
        print(f"[probe] {name}: {dt:.2f}s", file=sys.stderr, flush=True)

    for r in range(reps):
        if r % 2 == 0:
            timed("cur", lambda: normalized_labels(m, aliases))
            timed("arr", labels_arr)
        else:
            timed("arr", labels_arr)
            timed("cur", lambda: normalized_labels(m, aliases))

    print(json.dumps({"cpus": cpus, "sf": sf, "equal": eq,
                      "fp_cur": f_cur, "fp_arr": f_arr,
                      "best": {k: min(v) for k, v in samples.items()},
                      "samples": samples}))
    spark.stop()


if __name__ == "__main__":
    main()
