"""Round-7 sessionization A/B (guide §1): the shipped window-lag +
groupBy form vs a single-aggregation form (collect_list of (ts,
event_id) structs, array_sort, gap-count fold) that avoids the window's
full sort of the events table. Fingerprint-checked.
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
    sf_dir = os.environ.get("PROBE_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PROBE_REPS", "4"))

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark)

    spark = get_spark(app_name="r7_sessionization", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.count()

    def cur():
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        e = ev.withColumn("prev_ts", F.lag("ts").over(w))
        e = e.withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | ((F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")) > 1800),
                1,
            ).otherwise(0),
        )
        return (
            e.groupBy("user_id").agg(
                F.min("ts").alias("created"), F.max("ts").alias("modified"),
                F.count("*").alias("n_events"),
                F.sum("new_sess").alias("n_sessions"),
            )
            .orderBy("user_id")
        )

    def agg():
        # one hash aggregate; per-user array sorted by the SAME
        # (ts, event_id) order the window used, gaps counted by a fold
        # over unix_timestamp seconds (bigint, exactly the lag form)
        per = ev.groupBy("user_id").agg(
            F.min("ts").alias("created"), F.max("ts").alias("modified"),
            F.count("*").alias("n_events"),
            F.array_sort(F.collect_list(F.struct("ts", "event_id"))).alias("es"),
        )
        secs = F.transform("es", lambda s: F.unix_timestamp(s["ts"]))
        n = F.size(F.col("es"))
        # sequence(1, 0) counts DOWN in Spark — guard the 1-event case
        n_sess = F.aggregate(
            F.when(n > 1, F.sequence(F.lit(1), n - 1))
            .otherwise(F.array().cast("array<int>")),
            F.lit(1).cast("bigint"),
            lambda acc, i: acc + F.when(
                (F.element_at(secs, i + 1) - F.element_at(secs, i)) > 1800, 1
            ).otherwise(0),
        )
        return per.select(
            "user_id", "created", "modified", "n_events",
            n_sess.alias("n_sessions"),
        ).orderBy("user_id")

    def fingerprint(df):
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")),
                       F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], str(row["h"]), tuple(df.dtypes))

    fa, fb = fingerprint(cur()), fingerprint(agg())
    eq = fa == fb
    if not eq:
        print(f"MISMATCH cur={fa} agg={fb}", file=sys.stderr)

    variants = {"cur": cur, "agg": agg}
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
        "cpus": cpus, "sf_dir": sf_dir, "equal": eq,
        "best": {k: min(v) for k, v in sorted(samples.items())},
        "samples": samples,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
