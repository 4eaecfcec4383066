"""Interleaved A/B attribution for the er_documents bench row: is the
context bonus (resolve(use_context=True), the round-4 default) the cost
driver on the documents-derived corpus, or is the round-4 regression VM
noise / another stage? (VERDICT r4 "What's wrong #1".)

Protocol (BENCH.md): same session, interleaved on/off per rep so noisy-
neighbor drift hits both arms equally, spark.catalog.clearCache() per
rep, min as the estimator, rep spreads reported.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (32), SPARK_GRAFT_AB_REPS (5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "5"))

    from session_graph_spark.plans.pipeline import resolve
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)
    from session_graph_spark.sources.testdata import documents_as_turns

    spark = get_spark(app_name="ab_er_documents", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    turns = documents_as_turns(spark, sf_dir)
    n_turns = turns.count()
    warm_udf_workers(spark, turns, cpus)

    times: dict[str, list[float]] = {"ctx_on": [], "ctx_off": []}
    for rep in range(reps):
        for arm, use_ctx in (("ctx_on", True), ("ctx_off", False)):
            spark.catalog.clearCache()
            t0 = time.time()
            res = resolve(spark, turns, use_context=use_ctx)
            res.mention_clusters.count()
            times[arm].append(round(time.time() - t0, 3))
            res.unpersist()
        print(f"rep {rep}: on={times['ctx_on'][-1]} off={times['ctx_off'][-1]}",
              file=sys.stderr)

    out = {
        "sf_dir": sf_dir, "cpus": cpus, "reps": reps, "n_turns": n_turns,
        "ctx_on": times["ctx_on"], "ctx_off": times["ctx_off"],
        "ctx_on_min": min(times["ctx_on"]),
        "ctx_off_min": min(times["ctx_off"]),
        "ctx_overhead_pct": round(
            100 * (min(times["ctx_on"]) / min(times["ctx_off"]) - 1), 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
