"""Round-7 extraction-variant A/B (interleaved, one JVM, guide §1):

  cur      — shipped extract_mentions_sql (two trie-regex scans; tail =
             transform/filter/array_distinct/slice chain)
  mark     — ONE trie scan: phrases wrapped in \\x01..\\x02 markers by a
             single regexp_replace; phrase extraction + residual
             tokenization become cheap marker-pattern scans
  fold     — tail rewritten as two chained aggregate() folds with the
             dedup + 10-cap inline: per-candidate norm/validity work
             stops once the cap is reached, and no intermediate
             normed/kept/deduped arrays are materialized
  markfold — both

Each variant must yield the IDENTICAL output table (fingerprint-checked
here; bit-level equivalence pinned in tests if adopted). Timed with the
noop sink, variant order rotated per rep.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

M1, M2 = "\x01", "\x02"


def build_variants():
    from pyspark.sql import functions as F

    from session_graph_spark.functions.filters import is_valid_entity_col
    from session_graph_spark.operators.extract import (
        EXTRACT_INPUT_MAX_CHARS, MAX_MENTIONS_PER_TURN, _PHRASE_RE,
        extract_mentions_sql)

    java_phrase_re = _PHRASE_RE.pattern
    lower_text = F.lower(F.substring("text", 1, EXTRACT_INPUT_MAX_CHARS))
    marker_extract = rf"{M1}([^{M2}]*){M2}"
    marker_or_ws = rf"{M1}[^{M2}]*{M2}|\s+"
    cap = MAX_MENTIONS_PER_TURN

    def head_cur(turns):
        """(ph array, resid string) via two trie scans — shipped shape."""
        return turns.select(
            "conv_id", "turn_idx", "platform", "ts",
            F.regexp_extract_all(lower_text, F.lit(java_phrase_re), 1).alias("ph"),
            F.regexp_replace(lower_text, java_phrase_re, " ").alias("resid"),
        ), r"\s+"

    def head_mark(turns):
        """(ph array, resid string) via ONE trie scan + marker scans."""
        marked = F.regexp_replace(lower_text, java_phrase_re, f"{M1}$1{M2}")
        t = turns.select(
            "conv_id", "turn_idx", "platform", "ts", marked.alias("resid"),
        ).withColumn(
            "ph", F.regexp_extract_all("resid", F.lit(marker_extract), 1)
        )
        return t, marker_or_ws

    def norm(x):
        return F.regexp_replace(x, r"[.,;:]+$", "")

    def tail_chain(t, tok_re):
        toks = F.filter(F.split("resid", tok_re), lambda x: x != "")
        cands = F.concat("ph", toks)
        n_ph = F.size("ph")
        normed = F.transform(cands, norm)
        kept = F.filter(normed, lambda x, i: (i < n_ph) | is_valid_entity_col(x))
        deduped = F.slice(F.array_distinct(kept), 1, cap)
        return t.select(
            "conv_id", "turn_idx", "platform", "ts",
            F.posexplode(deduped).alias("pos", "norm_label"),
        )

    def tail_fold(t, tok_re):
        toks = F.filter(F.split("resid", tok_re), lambda x: x != "")
        empty = F.array().cast("array<string>")

        def ph_merge(acc, x):
            nx = norm(x)
            keep = (F.size(acc) < cap) & ~F.array_contains(acc, nx)
            return F.when(keep, F.array_append(acc, nx)).otherwise(acc)

        def tok_merge(acc, x):
            nx = norm(x)
            keep = ((F.size(acc) < cap) & ~F.array_contains(acc, nx)
                    & is_valid_entity_col(nx))
            return F.when(keep, F.array_append(acc, nx)).otherwise(acc)

        deduped = F.aggregate(toks, F.aggregate("ph", empty, ph_merge),
                              tok_merge)
        return t.select(
            "conv_id", "turn_idx", "platform", "ts",
            F.posexplode(deduped).alias("pos", "norm_label"),
        )

    def finish(out):
        return out.select(
            "conv_id", "turn_idx", "platform", "ts",
            F.col("norm_label").alias("mention"),
            "norm_label",
            F.concat_ws("|", "conv_id", "turn_idx", "pos").alias("mention_id"),
            F.col("pos").cast("int").alias("pos"),
        )

    def v_cur(turns):
        return extract_mentions_sql(turns)

    def v_mark(turns):
        t, tok_re = head_mark(turns)
        return finish(tail_chain(t, tok_re))

    def v_fold(turns):
        t, tok_re = head_cur(turns)
        return finish(tail_fold(t, tok_re))

    def v_markfold(turns):
        t, tok_re = head_mark(turns)
        return finish(tail_fold(t, tok_re))

    return {"cur": v_cur, "mark": v_mark, "fold": v_fold,
            "markfold": v_markfold}


def main() -> None:
    cpus = int(os.environ.get("PROBE_CPUS", "32"))
    sf = float(os.environ.get("PROBE_SF", "0.1"))
    reps = int(os.environ.get("PROBE_REPS", "3"))

    from pyspark.sql import functions as F

    from session_graph_spark import corpus
    from session_graph_spark.plans.pipeline import prepare_turns
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    spark = get_spark(app_name="r7_variants", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    n_convs = max(300, int(1_800_000 * sf))
    path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    turns_df = spark.read.parquet(path)
    turns_df.count()
    warm_udf_workers(spark, turns_df, cpus)

    variants = build_variants()
    turns = prepare_turns(spark.read.parquet(path))

    # output-equality fingerprints on a slice
    fps = {}
    small = turns.limit(200_000)
    for name, fn in variants.items():
        row = fn(small).agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.xxhash64("conv_id", "turn_idx", "mention",
                                        "norm_label", "mention_id", "pos")
                             .cast("decimal(38,0)")), F.lit(0)).alias("h"),
        ).collect()[0]
        fps[name] = (row["n"], str(row["h"]))
    eq = {k: v == fps["cur"] for k, v in fps.items()}

    samples: dict[str, list[float]] = {}
    order = list(variants)
    for r in range(reps):
        rot = order[r % len(order):] + order[:r % len(order)]
        for name in rot:
            spark.sparkContext.setJobDescription(f"variant {name} rep {r}")
            t0 = time.time()
            variants[name](turns).write.format("noop").mode("overwrite").save()
            samples.setdefault(name, []).append(round(time.time() - t0, 3))
    print(json.dumps({
        "cpus": cpus, "sf": sf, "equal_fingerprints": eq,
        "fingerprints": fps,
        "best": {k: min(v) for k, v in samples.items()},
        "samples": samples,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
