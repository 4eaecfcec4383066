"""Round-7 pass-3 A/Bs on the headline's serial action chain (guide
§2.6 / §5):

arm `cur`      — the shipped fast-path prefix: materialize the m_arrays
                 cache (agg sum(size) action), THEN run the labels count.
arm `overlap`  — submit the same two actions from two driver threads:
                 FIFO scheduling backfills the extraction stage's tail
                 with the labels job's map tasks, and the block-manager
                 cache locks guarantee each cached partition is computed
                 exactly once (same results, same work, less idle tail).
arm `nocomp`   — `cur` with spark.sql.inMemoryColumnarStorage.compressed
                 =false while building the cache (population CPU vs
                 memory trade; the heap now has room after the 16g fix).

Reported per arm: wall seconds for the full prefix (extraction action +
labels count), best-of-N interleaved; n_mentions/labels counts asserted
equal across arms.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(os.environ.get("PROBE_CPUS", "32"))
    sf = float(os.environ.get("PROBE_SF", "1.0"))
    reps = int(os.environ.get("PROBE_REPS", "3"))

    from pyspark.sql import functions as F

    from session_graph_spark import corpus
    from session_graph_spark.plans.pipeline import (alias_df,
                                                    mention_arrays_from_turns,
                                                    normalized_labels_from_arrays,
                                                    prepare_turns)
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    spark = get_spark(app_name="r7_cache_overlap", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    n_convs = max(300, int(1_800_000 * sf))
    path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    turns_df = spark.read.parquet(path)
    turns_df.count()
    warm_udf_workers(spark, turns_df, cpus)
    aliases = alias_df(spark)

    results: dict[str, set] = {}

    def build(compressed: bool = True):
        spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed",
                       str(compressed).lower())
        m = mention_arrays_from_turns(
            prepare_turns(spark.read.parquet(path))).cache()
        lb = normalized_labels_from_arrays(m, aliases).cache()
        return m, lb

    def seq(compressed: bool = True):
        m, lb = build(compressed)
        n_mentions = m.agg(F.sum(F.size("norm_labels"))).collect()[0][0]
        n_labels = lb.count()
        return m, lb, (int(n_mentions), int(n_labels))

    def cur():
        return seq(True)

    def nocomp():
        return seq(False)

    def overlap():
        m, lb = build(True)
        with ThreadPoolExecutor(max_workers=2) as pool:
            f1 = pool.submit(
                lambda: m.agg(F.sum(F.size("norm_labels"))).collect()[0][0])
            f2 = pool.submit(lb.count)
            n_mentions, n_labels = f1.result(), f2.result()
        return m, lb, (int(n_mentions), int(n_labels))

    variants = {"cur": cur, "overlap": overlap, "nocomp": nocomp}
    samples: dict[str, list[float]] = {}
    order = list(variants)
    for r in range(reps):
        rot = order[r % len(order):] + order[:r % len(order)]
        for name in rot:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} rep {r}")
            t0 = time.time()
            m, lb, counts = variants[name]()
            samples.setdefault(name, []).append(round(time.time() - t0, 3))
            results.setdefault(name, set()).add(counts)
            m.unpersist()
            lb.unpersist()
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "true")
    eq = len({frozenset(v) for v in results.values()}) == 1
    print(json.dumps({
        "cpus": cpus, "sf": sf, "equal": eq,
        "counts": {k: sorted(v) for k, v in results.items()},
        "best": {k: min(v) for k, v in sorted(samples.items())},
        "samples": samples,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
