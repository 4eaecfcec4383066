"""Round-7 labels-stage A/B, pass 3 (guide §1.2 per-task work): the
shipped per-conv alias lookup `coalesce(element_at(amap, x), x)` does a
LINEAR key walk over the 188-entry literal map for every distinct label
of every conversation (Spark's ElementAt on MapType scans the key array;
misses — the overwhelming majority — pay the full 188 comparisons). The
variant guards the lookup with `x.isin(<alias surfaces>)`, which the
optimizer compiles to an InSet hash probe, so misses cost O(1) and only
true alias hits pay the map walk. Decision-identical by construction:
isin(keys) is exactly the condition under which element_at is non-null.
Fingerprint equality asserted on the labels output.
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
    from session_graph_spark.plans.pipeline import (_labels_tail, alias_df,
                                                    mention_arrays_from_turns,
                                                    normalized_labels_from_arrays,
                                                    prepare_turns)
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    spark = get_spark(app_name="r7_labels_variants3", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    n_convs = max(300, int(1_800_000 * sf))
    path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    turns_df = spark.read.parquet(path)
    turns_df.count()
    warm_udf_workers(spark, turns_df, cpus)

    aliases = alias_df(spark)
    alias_pairs = [(r["surface"], r["canonical"])
                   for r in aliases.select("surface", "canonical").collect()]
    amap = F.create_map(*[F.lit(x) for pair in alias_pairs for x in pair])
    akeys = [s for s, _ in alias_pairs]

    m_arrays = mention_arrays_from_turns(
        prepare_turns(spark.read.parquet(path))).cache()
    m_arrays.agg(F.sum(F.size("norm_labels"))).collect()

    def cur():
        return normalized_labels_from_arrays(m_arrays, aliases)

    def inset():
        per_conv = m_arrays.groupBy("conv_id").agg(
            F.flatten(F.collect_list("norm_labels")).alias("ls"))
        canon_set = F.array_distinct(F.transform(
            F.array_distinct("ls"),
            lambda x: F.when(x.isin(akeys),
                             F.coalesce(F.element_at(amap, x), x))
                       .otherwise(x)))
        counts = (
            per_conv.select(F.explode(canon_set).alias("canon_label"))
            .groupBy("canon_label").agg(F.count("*").alias("n_sessions"))
            .where(F.col("n_sessions") >= 2)
        )
        return _labels_tail(counts, aliases)

    def fingerprint(df):
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.xxhash64("canon_label", "n_sessions",
                                        "block_key").cast("decimal(38,0)")),
                       F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], str(row["h"]))

    fa, fb = fingerprint(cur()), fingerprint(inset())
    eq = fa == fb
    if not eq:
        print(f"MISMATCH cur={fa} inset={fb}", file=sys.stderr)

    variants = {"cur": cur, "inset": inset}
    samples: dict[str, list[float]] = {}
    order = list(variants)
    for r in range(reps):
        rot = order[r % len(order):] + order[:r % len(order)]
        for name in rot:
            spark.sparkContext.setJobDescription(f"{name} rep {r}")
            t0 = time.time()
            variants[name]().write.format("noop").mode("overwrite").save()
            samples.setdefault(name, []).append(round(time.time() - t0, 3))
    print(json.dumps({
        "cpus": cpus, "sf": sf, "equal": eq,
        "best": {k: min(v) for k, v in sorted(samples.items())},
        "samples": samples,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
