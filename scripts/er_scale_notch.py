"""Corpus-size scaling notch (VERDICT r4 task 7): run the headline ER
pipeline at a LARGER synthetic-corpus scale than the per-round bench's
sf0.1 and report turns/sec. If throughput at 3-10x the corpus stays
within ~0.8x of the sf0.1 rate, the headline plan is flat in corpus size
— the strongest 100x-scale claim a single-host sandbox can produce.

Env: SPARK_GRAFT_NOTCH_SF (default 0.3; 1.0 = 1.8M convs / ~25M turns),
     SPARK_GRAFT_CPUS (32), SPARK_GRAFT_NOTCH_REPS (2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = float(os.environ.get("SPARK_GRAFT_NOTCH_SF", "0.3"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_NOTCH_REPS", "2"))

    from session_graph_spark import corpus
    from session_graph_spark.plans.pipeline import resolve
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    spark = get_spark(app_name="er_scale_notch", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    # same corpus recipe, cache key AND partition count as bench.py — the
    # cache key does not include the partition count, so writing a
    # different layout under it would silently change the input bench's
    # cross-parallelism comparisons read
    n_convs = max(300, int(1_800_000 * sf))
    path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        t0 = time.time()
        corpus.generate_turns_distributed(
            spark, n_convs=n_convs, seed=42, partitions=64
        ).write.mode("overwrite").parquet(path)
        print(f"generated {n_convs} convs in {time.time() - t0:.0f}s",
              file=sys.stderr)
    n_turns = spark.read.parquet(path).count()
    warm_udf_workers(spark, spark.read.parquet(path), cpus)

    runs = []
    for rep in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        res = resolve(spark, spark.read.parquet(path))
        res.clusters.count()
        res.mention_clusters.count()
        dt = round(time.time() - t0, 3)
        res.unpersist()
        runs.append(dt)
        print(f"rep {rep}: {dt}s ({n_turns / dt:.0f} turns/s)", file=sys.stderr)

    best = min(runs)
    print(json.dumps({
        "notch_sf": sf, "cpus": cpus, "n_turns": n_turns, "reps": runs,
        "er_pipeline_best_sec": best,
        "turns_per_sec": round(n_turns / best, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
