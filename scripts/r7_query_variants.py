"""Round-7 query-layer A/B (guide §1): old vs rewritten plans for the
bench-timed query paths, interleaved in one JVM at sf0.1, with output
fingerprint equality asserted before any timing is trusted.

Pairs:
  hub       — countDistinct two-exchange agg  vs in-array dedup + count
  cooc      — distinct + self-join             vs in-array pair generation
  textfeat  — explode/groupBy/joins + UDF      vs single-scan projection
  ann       — per-pair norms + 1-window top-k  vs hoisted norms + salted rank
  kblink    — row_number window                vs min_by aggregate
  docturns  — wide window                      vs narrow window + broadcast join

Old variants are inlined copies of the round-6 code; new variants import
the shipped functions. Timed with the noop sink, order rotated per rep.
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
    sf_dir = os.environ.get("PROBE_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PROBE_REPS", "3"))
    only = set(os.environ.get("PROBE_ONLY", "").split(",")) - {""}

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    spark = get_spark(app_name="r7_query_variants", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()
    warm_udf_workers(spark, docs.select(F.col("doc_id").cast("string")
                                        .alias("conv_id")), cpus)

    # ---- old implementations (round-6 copies) ---------------------------
    def _tokens():
        return (docs.select("doc_id", "source", "lang",
                            F.explode(F.split("text", " ")).alias("token"))
                .where(F.length("token") >= 3))

    def old_hub():
        return (_tokens().groupBy("token")
                .agg(F.countDistinct("doc_id").alias("degree"))
                .orderBy(F.desc("degree"), F.asc("token")).limit(20))

    def old_cooc():
        t = _tokens().select("doc_id", "token").distinct()
        a = t.select("doc_id", F.col("token").alias("token_a"))
        b = t.select("doc_id", F.col("token").alias("token_b"))
        return (a.join(b, "doc_id").where(F.col("token_a") < F.col("token_b"))
                .groupBy("token_a", "token_b").agg(F.count("*").alias("n_docs"))
                .orderBy(F.desc("n_docs"), F.asc("token_a"),
                         F.asc("token_b")).limit(20))

    def old_textfeat():
        from session_graph_spark.functions.text import lang_id, quality_features
        d = docs
        base = d.select(
            "doc_id",
            F.size(F.split("text", " ")).alias("n_tokens"),
            F.md5(F.substring("text", 1, 64)).alias("fp"),
            lang_id(F.col("text")).alias("lang_pred"),
        )
        qf = quality_features(d).select(
            "doc_id", "n_tokens_q", "punct_ratio", "stopword_ratio_en",
            "quality_score")
        tok = (
            d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
            .groupBy("doc_id")
            .agg(
                F.round(F.avg(F.length("token")), 4).alias("avg_token_len"),
                F.round(
                    F.sum(F.when(F.col("token").isin("the", "a"), 1)
                          .otherwise(0)) / F.count("*"), 4,
                ).alias("stopword_ratio"),
            )
        )
        return base.join(qf, "doc_id").join(tok, "doc_id").orderBy("doc_id")

    def old_ann():
        from session_graph_spark.operators.ann import cosine_expr
        e0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q0 = e0.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
        e = e0.select(F.col("vec_id"),
                      F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        q = q0.select("query_id",
                      F.transform("qv", lambda x: x.cast("double")).alias("qv"))
        j = F.broadcast(q).crossJoin(e).where(F.col("vec_id") != F.col("query_id"))
        j = j.withColumn("cosine", cosine_expr(F.col("qv"), F.col("v")))
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
        return (j.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 10)
                .select("query_id", "vec_id", "rank",
                        F.round("cosine", 6).alias("cosine")))

    def _doc_labels():
        return (docs.select(F.explode(F.split("text", " ")).alias("label"))
                .where(F.length("label") >= 3).distinct())

    def old_kblink():
        # round-6 link_to_kb body (window form), context-free path
        from session_graph_spark.operators.linking import (
            CONFIDENCE_THRESHOLD, _match_dim, kb_df)
        labels = _doc_labels()
        q = labels.select(F.lower(F.trim(F.col("label"))).alias("label")).distinct()
        q = q.withColumn("context", F.lit(None).cast("array<string>"))
        q = q.withColumn("ctx_is_tech", F.lit(None).cast("boolean"))
        dim = F.broadcast(_match_dim(kb_df(spark)))
        cand = q.join(dim, q.label == dim.match_key, "left")
        conf = (
            F.when(F.col("match_key").isNull(), F.lit(0.0))
            .when(~F.col("via_alias"), F.lit(1.0))
            .when(F.col("is_tech"), F.lit(0.8))
            .otherwise(F.lit(0.5))
        )
        cand = cand.withColumn("confidence", conf)
        desc_words = F.split(F.lower(F.col("description")), " ")
        ctx_words = F.split(F.lower(F.concat_ws(" ", F.col("context"))), " ")
        overlap = F.greatest(
            F.coalesce(F.size(F.array_intersect(ctx_words, desc_words)), F.lit(0)),
            F.lit(0))
        agree = (
            F.when(F.col("ctx_is_tech").isNull(), F.lit(0))
            .when(F.col("ctx_is_tech") == F.col("is_tech"), F.lit(2))
            .otherwise(F.lit(0)))
        cand = cand.withColumn("ctx_score", agree + F.least(overlap, F.lit(3)))
        w = Window.partitionBy("label").orderBy(
            F.desc("confidence"), F.desc("ctx_score"), F.asc_nulls_last("kb_id"))
        th = CONFIDENCE_THRESHOLD
        return (
            cand.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .select(
                "label",
                F.when(F.col("confidence") >= th, F.col("kb_id")).alias("kb_id"),
                F.when(F.col("confidence") >= th, F.col("kb_label")).alias("kb_label"),
                F.when(F.col("confidence") >= th,
                       F.col("description")).alias("description"),
                "confidence",
                (F.col("confidence") >= th).alias("linked"),
            ))

    def old_docturns():
        w = Window.partitionBy("source").orderBy("doc_id")
        return docs.select(
            F.col("source").alias("conv_id"),
            (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
            F.lit("assistant").alias("role"),
            F.col("text"),
            F.lit(None).cast("string").alias("tool"),
            (F.to_timestamp(F.lit("2026-01-01 00:00:00"))
             + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0),
                                  F.col("doc_id").cast("double"))).alias("ts"),
            F.col("lang").alias("platform"),
            F.concat(F.lit("/projects/p0/"), F.col("source"),
                     F.lit(".jsonl")).alias("source_file"),
        )

    # ---- new implementations (shipped) ----------------------------------
    def new_hub():
        return E.q_hub_entities(spark, sf_dir)

    def new_cooc():
        return E.q_cooccurrence(spark, sf_dir)

    def new_textfeat():
        return E.q_text_features(spark, sf_dir)

    def new_ann():
        return E.q_ann_topk(spark, sf_dir)

    def new_kblink():
        from session_graph_spark.operators.linking import kb_df, link_to_kb
        return link_to_kb(_doc_labels(), kb_df(spark))

    def new_docturns():
        from session_graph_spark.sources.testdata import documents_as_turns
        return documents_as_turns(spark, sf_dir)

    pairs = {
        "hub": (old_hub, new_hub),
        "cooc": (old_cooc, new_cooc),
        "textfeat": (old_textfeat, new_textfeat),
        "ann": (old_ann, new_ann),
        "kblink": (old_kblink, new_kblink),
        "docturns": (old_docturns, new_docturns),
    }
    if only:
        pairs = {k: v for k, v in pairs.items() if k in only}

    def fingerprint(df):
        cols = df.columns
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.xxhash64(*cols).cast("decimal(38,0)")),
                       F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], str(row["h"]), tuple(df.dtypes))

    eq = {}
    for name, (old, new) in pairs.items():
        fo, fn = fingerprint(old()), fingerprint(new())
        eq[name] = fo == fn
        if fo != fn:
            print(f"MISMATCH {name}: old={fo} new={fn}", file=sys.stderr)

    samples: dict[str, list[float]] = {}
    arms = [(n, "old", o) for n, (o, _) in pairs.items()] + \
           [(n, "new", f) for n, (_, f) in pairs.items()]
    for r in range(reps):
        rot = arms[r % len(arms):] + arms[:r % len(arms)]
        for name, arm, fn in rot:
            spark.sparkContext.setJobDescription(f"{name}:{arm} rep {r}")
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            samples.setdefault(f"{name}:{arm}", []).append(
                round(time.time() - t0, 3))
    print(json.dumps({
        "cpus": cpus, "sf_dir": sf_dir, "equal": eq,
        "best": {k: min(v) for k, v in sorted(samples.items())},
        "samples": samples,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
