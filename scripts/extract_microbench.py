"""Attribute the extraction stage's per-turn cost (round 6): time each
physical component of extract_mentions_sql separately on the bench
corpus, so optimization effort lands on the dominant term instead of a
guess. Aggregates consume every computed value (a bare count() would let
Catalyst prune the expression under test).

Env: XMB_CPUS (default 8), XMB_SF (default 0.1). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(os.environ.get("XMB_CPUS", "8"))
    sf = float(os.environ.get("XMB_SF", "0.1"))

    from pyspark.sql import functions as F

    from session_graph_spark import corpus
    from session_graph_spark.functions.filters import is_valid_entity_col
    from session_graph_spark.operators import extract as X
    from session_graph_spark.plans import pipeline as P
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    n_convs = max(300, int(1_800_000 * sf))
    path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
    spark = get_spark(app_name="extract_microbench",
                      master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        corpus.generate_turns_distributed(
            spark, n_convs=n_convs, seed=42, partitions=64
        ).write.mode("overwrite").parquet(path)
    warm_udf_workers(spark, spark.read.parquet(path), cpus)

    turns = P.prepare_turns(spark.read.parquet(path)).cache()
    n = turns.count()

    pat = X._PHRASE_RE.pattern
    lower_text = F.lower(F.substring("text", 1, X.EXTRACT_INPUT_MAX_CHARS))

    comp: dict[str, float] = {}

    def timed(name, df):
        t0 = time.time()
        df.collect()
        comp[name] = round(time.time() - t0, 3)

    # baseline: touch the text column only
    timed("text_touch", turns.agg(F.sum(F.length(lower_text))))

    # trie-regex scan 1: phrase extraction
    ph = F.regexp_extract_all(lower_text, F.lit(pat), 1)
    timed("phrase_extract", turns.agg(F.sum(F.size(ph))))

    # trie-regex scan 2: phrase blanking
    resid = F.regexp_replace(lower_text, pat, " ")
    timed("phrase_replace", turns.agg(F.sum(F.length(resid))))

    # tokenization on top of the blanking
    toks = F.filter(F.split(resid, r"\s+"), lambda x: x != "")
    timed("replace_plus_split", turns.agg(F.sum(F.size(toks))))

    # candidate-pipeline tail, structured EXACTLY like the real plan
    # (ph/resid projected into columns first — inlining the regex
    # expressions instead re-evaluates them per lambda element and is
    # ~16x slower, see the first microbench revision's numbers):
    # current norm (trim + ws-collapse + punct) vs punct-strip-only
    # (trim/ws are provable no-ops on split tokens and literal
    # gazetteer matches)
    def norm_cur(x):
        y = F.regexp_replace(F.trim(x), r"\s+", " ")
        return F.regexp_replace(y, r"[.,;:]+$", "")

    def norm_min(x):
        return F.regexp_replace(x, r"[.,;:]+$", "")

    base = turns.select(
        ph.alias("ph"),
        F.filter(F.split(F.regexp_replace(lower_text, pat, " "), r"\s+"),
                 lambda x: x != "").alias("toks"),
    )
    for name, normf in (("tail_norm_cur", norm_cur), ("tail_norm_min", norm_min)):
        n_ph = F.size("ph")
        cands = F.concat("ph", "toks")
        normed = F.transform(cands, normf)
        kept = F.filter(normed, lambda x, i: (i < n_ph) | is_valid_entity_col(x))
        deduped = F.slice(F.array_distinct(kept), 1, X.MAX_MENTIONS_PER_TURN)
        timed(name, base.agg(F.sum(F.size(deduped))))
    # tail with norm but WITHOUT the validity filter (attributes the
    # L1 rlikes vs the norm regexes inside the tail)
    n_ph = F.size("ph")
    normed = F.transform(F.concat("ph", "toks"), norm_cur)
    deduped = F.slice(F.array_distinct(normed), 1, X.MAX_MENTIONS_PER_TURN)
    timed("tail_no_validity", base.agg(F.sum(F.size(deduped))))

    # the real full plan (posexplode included) for reference
    t0 = time.time()
    X.extract_mentions_sql(turns).agg(F.count("*")).collect()
    comp["full_plan_explode"] = round(time.time() - t0, 3)

    print(json.dumps({"cpus": cpus, "sf": sf, "n_turns": n, "components": comp}))
    spark.stop()


if __name__ == "__main__":
    main()
