"""Re-measure the round-4 small-query drift (VERDICT r4 "What's wrong
#2"): hub_entities / cooccurrence / ann_topk drifted 1.3-1.8x slower
between rounds 3 and 4 with unchanged code. Run them interleaved for N
reps in one session and report per-rep spreads — if the spread envelope
covers both rounds' numbers, the drift is VM noise, not a regression.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (32), SPARK_GRAFT_DRIFT_REPS (6).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["hub_entities", "cooccurrence", "ann_topk"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_DRIFT_REPS", "6"))

    from session_graph_spark.session import bench_shuffle_partitions, get_spark

    spark = get_spark(app_name="drift_microbench", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()
    # one untimed warmup pass (codegen + file-listing caches, matching the
    # per-round bench which runs after the big ER stage has warmed the JVM)
    for q in QUERIES:
        qs[q](spark, sf_dir).collect()

    times: dict[str, list[float]] = {q: [] for q in QUERIES}
    for rep in range(reps):
        for q in QUERIES:
            spark.catalog.clearCache()
            t0 = time.time()
            qs[q](spark, sf_dir).collect()
            times[q].append(round(time.time() - t0, 3))
        print(f"rep {rep}: " + " ".join(f"{q}={times[q][-1]}" for q in QUERIES),
              file=sys.stderr)

    print(json.dumps({
        "sf_dir": sf_dir, "cpus": cpus, "reps": reps,
        **{q: {"reps": times[q], "min": min(times[q]), "max": max(times[q])}
           for q in QUERIES},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
