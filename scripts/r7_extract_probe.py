"""Round-7 probe: split the headline's mentions stage (57.9s at sf1.0,
local[32] — floor_profile) into extraction COMPUTE vs CACHE-BUILD vs
CACHE-SCAN, interleaved reps in one JVM so every arm samples the same
noise windows.

Arms per rep:
  noop        — extraction plan -> noop sink (pure compute, guide §1.4)
  cache_build — extraction.cache().count() (compute + cache population)
  cache_scan  — .count() again on the materialized cache
  labels_from_cache — normalized_labels(...).count() over the hot cache
(unpersist between reps so cache_build is honest each time)

Prints one JSON line with per-arm best-of and all samples.
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
    reps = int(os.environ.get("PROBE_REPS", "2"))

    from session_graph_spark import corpus
    from session_graph_spark.plans.pipeline import (alias_df,
                                                    mentions_from_turns,
                                                    normalized_labels,
                                                    prepare_turns)
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    spark = get_spark(app_name="r7_extract_probe", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    n_convs = max(300, int(1_800_000 * sf))
    path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
    assert os.path.exists(os.path.join(path, "_SUCCESS")), "pregen corpus first"
    turns_df = spark.read.parquet(path)
    turns_df.count()
    warm_udf_workers(spark, turns_df, cpus)
    # small full-plan warmup (codegen/JIT) as bench.py does
    from session_graph_spark.plans.pipeline import resolve
    w = resolve(spark, corpus.generate_turns(spark, n_convs=300, seed=7))
    w.mention_clusters.count()
    w.unpersist()
    spark.catalog.clearCache()

    aliases = alias_df(spark)
    samples: dict[str, list[float]] = {}

    def rec(name: str, dt: float) -> None:
        samples.setdefault(name, []).append(round(dt, 3))
        print(f"[probe] {name}: {dt:.2f}s", file=sys.stderr, flush=True)

    from session_graph_spark.operators.extract import explode_mention_arrays
    from session_graph_spark.plans.pipeline import mention_arrays_from_turns

    for _ in range(reps):
        t = prepare_turns(spark.read.parquet(path))
        m_plan = mentions_from_turns(t)
        arr_plan = mention_arrays_from_turns(t)

        spark.sparkContext.setJobDescription("probe: exploded extraction noop")
        t0 = time.time()
        m_plan.write.format("noop").mode("overwrite").save()
        rec("noop", time.time() - t0)

        spark.sparkContext.setJobDescription("probe: array extraction noop")
        t0 = time.time()
        arr_plan.write.format("noop").mode("overwrite").save()
        rec("arrays_noop", time.time() - t0)

        spark.sparkContext.setJobDescription("probe: array cache build + explode count")
        arr = arr_plan.cache()
        m = explode_mention_arrays(arr)
        t0 = time.time()
        m.count()
        rec("arrays_cache_build_explode_count", time.time() - t0)

        spark.sparkContext.setJobDescription("probe: explode count from hot cache")
        t0 = time.time()
        m.count()
        rec("explode_count_from_cache", time.time() - t0)

        spark.sparkContext.setJobDescription("probe: labels from hot cache")
        t0 = time.time()
        normalized_labels(m, aliases).count()
        rec("labels_from_cache", time.time() - t0)

        arr.unpersist(True)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "cpus": cpus, "sf": sf, "reps": reps,
        "best": {k: min(v) for k, v in samples.items()},
        "samples": samples,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
