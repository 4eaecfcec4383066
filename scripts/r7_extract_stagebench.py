"""Round-7 extraction-chain attribution (guide §1): time cumulative
prefixes of the mentions-stage chain with the noop sink, so each delta
prices ONE link — scan/filter, trie-regex marking, marker extract,
tokenize+norm, validity filter + dedup/cap, cache write, and the shipped
cache-materializing action (sum of array sizes).

Prints one JSON line with best-of-reps per arm, interleaved rotation.
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

    from pyspark.sql import functions as F

    from session_graph_spark import corpus
    from session_graph_spark.functions.filters import is_valid_entity_col
    from session_graph_spark.operators.extract import (
        EXTRACT_INPUT_MAX_CHARS, MAX_MENTIONS_PER_TURN, _M1, _M2,
        _MARKER_EXTRACT, _MARKER_OR_WS, _PHRASE_RE)
    from session_graph_spark.plans.pipeline import prepare_turns
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    spark = get_spark(app_name="r7_extract_stagebench",
                      master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    n_convs = max(300, int(1_800_000 * sf))
    path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
    assert os.path.exists(os.path.join(path, "_SUCCESS")), "pregen corpus first"
    turns_df = spark.read.parquet(path)
    turns_df.count()
    warm_udf_workers(spark, turns_df, cpus)

    java_phrase_re = _PHRASE_RE.pattern
    lower_text = F.lower(F.substring("text", 1, EXTRACT_INPUT_MAX_CHARS))

    def base():
        t = prepare_turns(spark.read.parquet(path))
        t = t.where(F.length(F.trim(F.col("text"))) >= 30)
        t = t.where(F.col("role") == "assistant")
        return t.select("conv_id", "turn_idx", "platform", "ts", "text")

    def arm_scan():
        return base().select("conv_id", "turn_idx", "platform", "ts",
                             F.length("text").alias("n"))

    def arm_mark():
        return base().select(
            "conv_id", "turn_idx", "platform", "ts",
            F.regexp_replace(lower_text, java_phrase_re,
                             f"{_M1}$1{_M2}").alias("resid"))

    def _marked():
        return base().select(
            "conv_id", "turn_idx", "platform", "ts",
            F.regexp_replace(lower_text, java_phrase_re,
                             f"{_M1}$1{_M2}").alias("resid"),
        ).withColumn(
            "ph", F.regexp_extract_all("resid", F.lit(_MARKER_EXTRACT), 1))

    def arm_ph():
        return _marked().select("conv_id", "turn_idx", "platform", "ts",
                                F.size("ph").alias("n"))

    def _cands():
        t = _marked()
        toks = F.filter(F.split("resid", _MARKER_OR_WS), lambda x: x != "")
        cands = F.concat("ph", toks)
        normed = F.transform(cands,
                             lambda x: F.regexp_replace(x, r"[.,;:]+$", ""))
        return t, normed

    def arm_norm():
        t, normed = _cands()
        return t.select("conv_id", "turn_idx", "platform", "ts",
                        F.size(normed.alias("x")).alias("n"))

    def arm_valid():
        from session_graph_spark.operators.extract import extract_mention_arrays
        return extract_mention_arrays(base())

    def arm_cache_sum():
        from session_graph_spark.operators.extract import extract_mention_arrays
        spark.catalog.clearCache()
        m = extract_mention_arrays(base()).cache()
        m.agg(F.sum(F.size("norm_labels"))).collect()
        m.unpersist()

    noop_arms = {
        "scan": arm_scan, "mark": arm_mark, "ph": arm_ph,
        "norm": arm_norm, "valid_dedup": arm_valid,
    }
    action_arms = {"cache_sum": arm_cache_sum}

    samples: dict[str, list[float]] = {}
    arms = list(noop_arms.items()) + list(action_arms.items())
    for r in range(reps):
        rot = arms[r % len(arms):] + arms[:r % len(arms)]
        for name, fn in rot:
            spark.sparkContext.setJobDescription(f"{name} rep {r}")
            t0 = time.time()
            if name in action_arms:
                fn()
            else:
                fn().write.format("noop").mode("overwrite").save()
            samples.setdefault(name, []).append(round(time.time() - t0, 3))
    print(json.dumps({
        "cpus": cpus, "sf": sf,
        "best": {k: min(v) for k, v in sorted(samples.items())},
        "samples": samples,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
