"""Round-7 extraction A/B, pass 2 (guide §1): the shipped
extract_mention_arrays (rtrim norm + dedup-before-validity + fused
validity regex unions) vs an inline copy of the pre-change chain
(regexp norm + validity-before-dedup + 19-rlike validity), interleaved
in one JVM, fingerprint-checked. Extra arms isolate each change.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(os.environ.get("PROBE_CPUS", "32"))
    sf = float(os.environ.get("PROBE_SF", "0.1"))
    reps = int(os.environ.get("PROBE_REPS", "3"))

    from pyspark.sql import functions as F

    from session_graph_spark import corpus
    from session_graph_spark.data import STOPWORDS, WHITELIST
    from session_graph_spark.functions.filters import (_L1, _SPECIAL_FIRST,
                                                       is_valid_entity_col)
    from session_graph_spark.operators.extract import (
        _MARKER_EXTRACT, _MARKER_OR_WS, _M1, _M2, _PHRASE_RE,
        EXTRACT_INPUT_MAX_CHARS, MAX_MENTIONS_PER_TURN,
        extract_mention_arrays)
    from session_graph_spark.plans.pipeline import prepare_turns
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    spark = get_spark(app_name="r7_extract_variants2", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    n_convs = max(300, int(1_800_000 * sf))
    path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    turns_df = spark.read.parquet(path)
    turns_df.count()
    warm_udf_workers(spark, turns_df, cpus)

    def base():
        t = prepare_turns(spark.read.parquet(path))
        t = t.where((F.col("role") == "assistant")
                    & (F.length(F.trim(F.col("text"))) >= 30))
        return t.select("conv_id", "turn_idx", "platform", "ts", "text")

    # ---- old building blocks (round-6 inline copies) --------------------
    def _flags(pat):
        return "(?i)" if pat.flags & re.I else ""

    def old_valid(c):
        n = F.length(c)
        base_reject = (n <= 1) | c.isin(*sorted(STOPWORDS))
        white = c.isin(*sorted(WHITELIST))
        first = F.substring(c, 1, 1)
        rej_full = first.isin(*_SPECIAL_FIRST)
        rej_full = rej_full | c.startswith("/") | c.contains("\\")
        for key in (
            "filename", "icd_short", "icd_underscore", "proto_code", "snake3",
            "num_prefix", "version", "px", "pure_num", "ip", "duration",
            "hexhash", "quantity", "ordinal", "fraction",
        ):
            rej_full = rej_full | c.rlike(
                _flags(_L1[key]) + r"\A(?:" + _L1[key].pattern + ")")
        rej_full = rej_full | c.rlike(_flags(_L1["css_dim"]) + _L1["css_dim"].pattern)
        rej_full = rej_full | c.contains("%")
        rej_full = rej_full | c.rlike(r"[\[\]]") | c.rlike(r"[()]")
        rej_full = rej_full | (n == 2)
        rej_full = rej_full | (F.size(F.split(c, " ")) > 3)
        plain = c.rlike(r"\A[a-z]+\Z")
        rej = F.when(plain, c.rlike(r"\A[a-f]{6,}\Z") | (n == 2)).otherwise(rej_full)
        return (~base_reject) & (white | ~rej)

    def norm_re(x):
        return F.regexp_replace(x, r"[.,;:]+$", "")

    def norm_trim(x):
        return F.rtrim(x, F.lit(".,;:"))

    def head(turns):
        java_phrase_re = _PHRASE_RE.pattern
        lower_text = F.lower(F.substring("text", 1, EXTRACT_INPUT_MAX_CHARS))
        return turns.select(
            "conv_id", "turn_idx", "platform", "ts",
            F.regexp_replace(lower_text, java_phrase_re,
                             f"{_M1}$1{_M2}").alias("resid"),
        ).withColumn(
            "ph", F.regexp_extract_all("resid", F.lit(_MARKER_EXTRACT), 1))

    def tail_old(t, norm, valid):
        toks = F.filter(F.split("resid", _MARKER_OR_WS), lambda x: x != "")
        cands = F.concat("ph", toks)
        n_ph = F.size("ph")
        normed = F.transform(cands, norm)
        kept = F.filter(normed, lambda x, i: (i < n_ph) | valid(x))
        deduped = F.slice(F.array_distinct(kept), 1, MAX_MENTIONS_PER_TURN)
        return t.select("conv_id", "turn_idx", "platform", "ts",
                        deduped.alias("norm_labels"))

    def tail_dedupfirst(t, norm, valid):
        toks = F.filter(F.split("resid", _MARKER_OR_WS), lambda x: x != "")
        cands = F.concat("ph", toks)
        normed = F.transform(cands, norm)
        n_ph_d = F.size(F.array_distinct(F.transform("ph", norm)))
        kept = F.filter(F.array_distinct(normed),
                        lambda x, i: (i < n_ph_d) | valid(x))
        return t.select("conv_id", "turn_idx", "platform", "ts",
                        F.slice(kept, 1, MAX_MENTIONS_PER_TURN)
                        .alias("norm_labels"))

    variants = {
        "old": lambda: tail_old(head(base()), norm_re, old_valid),
        "trim_only": lambda: tail_old(head(base()), norm_trim, old_valid),
        "dedup_only": lambda: tail_dedupfirst(head(base()), norm_re, old_valid),
        "union_only": lambda: tail_old(head(base()), norm_re,
                                       is_valid_entity_col),
        "new": lambda: extract_mention_arrays(base()),
    }

    def fingerprint(df):
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.xxhash64(
                "conv_id", "turn_idx",
                F.concat_ws("\x00", "norm_labels")).cast("decimal(38,0)")),
                F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], str(row["h"]))

    small = base().limit(200_000)

    def fp_on_small(fn):
        # rebuild the variant over the limited input
        return fn

    fps = {}
    sm_variants = {
        "old": tail_old(head(small), norm_re, old_valid),
        "trim_only": tail_old(head(small), norm_trim, old_valid),
        "dedup_only": tail_dedupfirst(head(small), norm_re, old_valid),
        "union_only": tail_old(head(small), norm_re, is_valid_entity_col),
        "new": extract_mention_arrays(small),
    }
    for name, df in sm_variants.items():
        fps[name] = fingerprint(df)
    eq = {k: v == fps["old"] for k, v in fps.items()}
    if not all(eq.values()):
        print(f"MISMATCH: {fps}", file=sys.stderr)

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
