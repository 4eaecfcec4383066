"""Round-7 labels-stage sub-attribution over the HOT array cache:
  explode_noop    — explode + (conv_id, norm_label) project
  probe_noop      — + alias broadcast probe (apply_aliases)
  labels_full     — + countDistinct agg + L2 filter + slug (the stage)
Interleaved reps, one JVM. Difference between arms isolates the
aggregation cost from the scan/probe cost.
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
    from session_graph_spark.functions.normalize import apply_aliases
    from session_graph_spark.operators.extract import explode_mention_arrays
    from session_graph_spark.plans.pipeline import (alias_df,
                                                    mention_arrays_from_turns,
                                                    normalized_labels,
                                                    prepare_turns)
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    spark = get_spark(app_name="r7_labels_probe", master=f"local[{cpus}]",
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
    m.count()  # materialize cache outside timed arms

    samples: dict[str, list[float]] = {}

    def timed(name, fn):
        spark.sparkContext.setJobDescription(f"labels probe {name}")
        t0 = time.time()
        fn()
        dt = time.time() - t0
        samples.setdefault(name, []).append(round(dt, 3))
        print(f"[probe] {name}: {dt:.2f}s", file=sys.stderr, flush=True)

    raw = m.select("conv_id", "norm_label")
    for _ in range(reps):
        timed("explode_noop",
              lambda: raw.write.format("noop").mode("overwrite").save())
        timed("probe_noop",
              lambda: apply_aliases(raw, aliases, label_col="norm_label",
                                    out_col="canon_label")
              .write.format("noop").mode("overwrite").save())
        timed("labels_full", lambda: normalized_labels(m, aliases).count())

    print(json.dumps({"cpus": cpus, "sf": sf,
                      "best": {k: min(v) for k, v in samples.items()},
                      "samples": samples}))
    spark.stop()


if __name__ == "__main__":
    main()
