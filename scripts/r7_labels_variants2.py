"""Round-7 labels-stage A/B, pass 2 (guide §1/§2.3): the shipped
normalized_labels_from_arrays (per-conv collect_list of per-turn arrays,
dedup AFTER the conv exchange) vs an explode + per-conv collect_set
variant (dedup map-side BEFORE the exchange — cross-turn duplicate
labels inside one conversation never cross the wire). Fingerprint
equality asserted on the labels OUTPUT (a set of rows; both forms end in
the same _labels_tail).
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

    spark = get_spark(app_name="r7_labels_variants2", master=f"local[{cpus}]",
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

    # mirror the resolve() fast path: variants read the CACHED arrays
    m_arrays = mention_arrays_from_turns(
        prepare_turns(spark.read.parquet(path))).cache()
    m_arrays.agg(F.sum(F.size("norm_labels"))).collect()

    def cur():
        return normalized_labels_from_arrays(m_arrays, aliases)

    def setvar():
        per_conv = (
            m_arrays.select("conv_id", F.explode("norm_labels").alias("l"))
            .groupBy("conv_id").agg(F.collect_set("l").alias("ls"))
        )
        canon_set = F.array_distinct(F.transform(
            F.col("ls"), lambda x: F.coalesce(F.element_at(amap, x), x)))
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

    fa, fb = fingerprint(cur()), fingerprint(setvar())
    eq = fa == fb
    if not eq:
        print(f"MISMATCH cur={fa} set={fb}", file=sys.stderr)

    variants = {"cur": cur, "set": setvar}
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
