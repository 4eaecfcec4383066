"""spark-submit entry point for the ER pipeline — the north-star
execution mode (`spark-submit --py-files session_graph_spark.zip
scripts/submit_job.py --turns ... --out ...`, reference deployment
analog: session-graph runs as a CLI over exported archives).

The package arrives via --py-files (a zip spark-submit puts on the
driver's and every executor's sys.path), so this script carries no
source checkout assumptions: master/memory/shuffle config come from
the submit command, imports come from the shipped archive. On a real
cluster the same invocation works with --master yarn/k8s, N executors,
and an object-store --turns/--out path.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", required=True, help="input turns parquet path")
    ap.add_argument("--out", required=True,
                    help="output dir: <out>/clusters, <out>/mention_clusters")
    ap.add_argument("--min-sessions", type=int, default=None,
                    help="frequency-prune threshold (default: pipeline's)")
    ap.add_argument("--bench-counts", action="store_true",
                    help="run the bench headline's exact actions "
                         "(clusters.count + mention_clusters.count, no "
                         "writes) and print headline_sec — the submit-mode "
                         "comparable of bench.py's er_pipeline row")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()

    from session_graph_spark.plans.pipeline import resolve

    kw = {}
    if args.min_sessions is not None:
        kw["min_sessions"] = args.min_sessions
    if args.bench_counts:
        import time

        t0 = time.time()
        res = resolve(spark, spark.read.parquet(args.turns), **kw)
        res.clusters.count()
        n_mc = res.mention_clusters.count()
        print(json.dumps({"headline_sec": round(time.time() - t0, 3),
                          "n_mention_clusters": n_mc}))
        spark.stop()
        return
    res = resolve(spark, spark.read.parquet(args.turns), **kw)
    res.clusters.write.mode("overwrite").parquet(f"{args.out}/clusters")
    res.mention_clusters.write.mode("overwrite").parquet(
        f"{args.out}/mention_clusters")

    clusters = spark.read.parquet(f"{args.out}/clusters")
    print(json.dumps({
        "n_labels": clusters.count(),
        "n_clusters": clusters.select("cluster_id").distinct().count(),
        "n_mentions": spark.read.parquet(
            f"{args.out}/mention_clusters").count(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
