"""Round-7 query-layer A/B, refinement pass: sub-variants of the round's
query rewrites, after the first A/B (r7_query_variants.py) showed several
full rewrites losing at sf0.1. Arms:

  docs_e2e_{old,new}   — er_documents END TO END (resolve over
                         documents_as_turns): the docturns window leaves
                         ~5 partitions (one per source), capping every
                         downstream stage's parallelism; the noop A/B of
                         the source alone cannot see that
  tf_{old,oldlangcol,newpandas,new} — which part of the text_features
                         rewrite wins/loses: join structure vs lang_id
  cooc_{old,mid,new}   — mid = in-array per-doc dedup + the old
                         self-join (drops the distinct exchange only)
  ann_{old,hoist,new}  — hoist = hoisted norms, single top-k window
  kb_{win,minby}       — link_to_kb best-candidate selection
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

    from session_graph_spark.session import (bench_shuffle_partitions,
                                             get_spark, warm_udf_workers)

    spark = get_spark(app_name="r7_query_variants2", master=f"local[{cpus}]",
                      shuffle_partitions=bench_shuffle_partitions(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()
    warm_udf_workers(spark, docs.select(F.col("doc_id").cast("string")
                                        .alias("conv_id")), cpus)

    # --- er_documents end to end ----------------------------------------
    def docturns_old():
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

    def docturns_new():
        from session_graph_spark.sources.testdata import documents_as_turns
        return documents_as_turns(spark, sf_dir)

    def run_resolve(turns_fn):
        from session_graph_spark.plans.pipeline import resolve
        spark.catalog.clearCache()
        res = resolve(spark, turns_fn())
        res.mention_clusters.count()
        res.unpersist()

    def docs_e2e_old():
        run_resolve(docturns_old)

    def docs_e2e_new():
        run_resolve(docturns_new)

    # --- text_features sub-variants -------------------------------------
    def _tf_joins(lang_expr_fn):
        from session_graph_spark.functions.text import quality_features
        d = docs
        base = d.select(
            "doc_id",
            F.size(F.split("text", " ")).alias("n_tokens"),
            F.md5(F.substring("text", 1, 64)).alias("fp"),
            lang_expr_fn().alias("lang_pred"),
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

    def _tf_single(lang_expr_fn):
        from session_graph_spark.functions.text import quality_features
        d = docs.where(F.col("text").isNotNull())
        d = d.withColumn("__arr", F.split("text", " "))
        n_arr = F.size("__arr")
        sum_len = F.aggregate(
            "__arr", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
        n_stop = F.size(F.filter("__arr", lambda x: x.isin("the", "a")))
        d = quality_features(d)
        return d.select(
            "doc_id",
            n_arr.alias("n_tokens"),
            F.md5(F.substring("text", 1, 64)).alias("fp"),
            lang_expr_fn().alias("lang_pred"),
            "n_tokens_q", "punct_ratio", "stopword_ratio_en", "quality_score",
            F.round(sum_len / n_arr, 4).alias("avg_token_len"),
            F.round(n_stop / n_arr, 4).alias("stopword_ratio"),
        ).orderBy("doc_id")

    def _lang_pandas():
        from session_graph_spark.functions.text import lang_id
        return lang_id(F.col("text"))

    def _lang_col():
        from session_graph_spark.functions.text import lang_id_col
        return lang_id_col(F.col("text"))

    def tf_old():
        return _tf_joins(_lang_pandas)

    def tf_oldlangcol():
        return _tf_joins(_lang_col)

    def tf_newpandas():
        return _tf_single(_lang_pandas)

    def tf_new():
        return _tf_single(_lang_col)

    # --- cooccurrence sub-variants --------------------------------------
    def cooc_old():
        t = (docs.select("doc_id",
                         F.explode(F.split("text", " ")).alias("token"))
             .where(F.length("token") >= 3)
             .select("doc_id", "token").distinct())
        a = t.select("doc_id", F.col("token").alias("token_a"))
        b = t.select("doc_id", F.col("token").alias("token_b"))
        return (a.join(b, "doc_id").where(F.col("token_a") < F.col("token_b"))
                .groupBy("token_a", "token_b").agg(F.count("*").alias("n_docs"))
                .orderBy(F.desc("n_docs"), F.asc("token_a"),
                         F.asc("token_b")).limit(20))

    def cooc_mid():
        t = docs.select(
            "doc_id",
            F.explode(F.array_distinct(
                F.filter(F.split("text", " "), lambda x: F.length(x) >= 3)
            )).alias("token"))
        a = t.select("doc_id", F.col("token").alias("token_a"))
        b = t.select("doc_id", F.col("token").alias("token_b"))
        return (a.join(b, "doc_id").where(F.col("token_a") < F.col("token_b"))
                .groupBy("token_a", "token_b").agg(F.count("*").alias("n_docs"))
                .orderBy(F.desc("n_docs"), F.asc("token_a"),
                         F.asc("token_b")).limit(20))

    def cooc_new():
        import __spark_entry__ as E
        return E.q_cooccurrence(spark, sf_dir)

    # --- ann sub-variants -------------------------------------------------
    def _ann_inputs():
        e0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q0 = e0.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
        return e0, q0

    def ann_old():
        from session_graph_spark.operators.ann import cosine_expr
        e0, q0 = _ann_inputs()
        e = e0.select("vec_id",
                      F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        q = q0.select("query_id",
                      F.transform("qv", lambda x: x.cast("double")).alias("qv"))
        j = F.broadcast(q).crossJoin(e).where(F.col("vec_id") != F.col("query_id"))
        j = j.withColumn("cosine", cosine_expr(F.col("qv"), F.col("v")))
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
        return (j.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 10)
                .select("query_id", "vec_id", "rank",
                        F.round("cosine", 6).alias("cosine")))

    def ann_hoist():
        from session_graph_spark.operators.ann import dot_expr
        e0, q0 = _ann_inputs()
        e = e0.select("vec_id",
                      F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        e = e.select("vec_id", "v",
                     F.sqrt(dot_expr(F.col("v"), F.col("v"))).alias("__vn"))
        q = q0.select("query_id",
                      F.transform("qv", lambda x: x.cast("double")).alias("qv"))
        q = q.select("query_id", "qv",
                     F.sqrt(dot_expr(F.col("qv"), F.col("qv"))).alias("__qn"))
        j = F.broadcast(q).crossJoin(e).where(F.col("vec_id") != F.col("query_id"))
        j = j.withColumn("cosine", dot_expr(F.col("qv"), F.col("v"))
                         / (F.col("__qn") * F.col("__vn")))
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
        return (j.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 10)
                .select("query_id", "vec_id", "rank",
                        F.round("cosine", 6).alias("cosine")))

    def ann_new():
        from session_graph_spark.operators.ann import brute_force_topk
        e0, q0 = _ann_inputs()
        return brute_force_topk(e0, q0, k=10)

    # --- kb link sub-variants --------------------------------------------
    def _doc_labels():
        return (docs.select(F.explode(F.split("text", " ")).alias("label"))
                .where(F.length("label") >= 3).distinct())

    def kb_minby():
        from session_graph_spark.operators.linking import kb_df, link_to_kb
        return link_to_kb(_doc_labels(), kb_df(spark))

    def kb_win():
        # round-6 window form
        from session_graph_spark.operators.linking import (
            CONFIDENCE_THRESHOLD, _match_dim, kb_df)
        q = _doc_labels().select(
            F.lower(F.trim(F.col("label"))).alias("label")).distinct()
        q = q.withColumn("context", F.lit(None).cast("array<string>"))
        q = q.withColumn("ctx_is_tech", F.lit(None).cast("boolean"))
        dim = F.broadcast(_match_dim(kb_df(spark)))
        cand = q.join(dim, q.label == dim.match_key, "left")
        conf = (
            F.when(F.col("match_key").isNull(), F.lit(0.0))
            .when(~F.col("via_alias"), F.lit(1.0))
            .when(F.col("is_tech"), F.lit(0.8))
            .otherwise(F.lit(0.5)))
        cand = cand.withColumn("confidence", conf)
        desc_words = F.split(F.lower(F.col("description")), " ")
        ctx_words = F.split(F.lower(F.concat_ws(" ", F.col("context"))), " ")
        overlap = F.greatest(
            F.coalesce(F.size(F.array_intersect(ctx_words, desc_words)),
                       F.lit(0)), F.lit(0))
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

    noop = {
        "tf_old": tf_old, "tf_oldlangcol": tf_oldlangcol,
        "tf_newpandas": tf_newpandas, "tf_new": tf_new,
        "cooc_old": cooc_old, "cooc_mid": cooc_mid, "cooc_new": cooc_new,
        "ann_old": ann_old, "ann_hoist": ann_hoist, "ann_new": ann_new,
        "kb_win": kb_win, "kb_minby": kb_minby,
    }
    e2e = {"docs_e2e_old": docs_e2e_old, "docs_e2e_new": docs_e2e_new}
    if only:
        noop = {k: v for k, v in noop.items() if k in only}
        e2e = {k: v for k, v in e2e.items() if k in only}

    def fingerprint(df):
        cols = df.columns
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.xxhash64(*cols).cast("decimal(38,0)")),
                       F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], str(row["h"]), tuple(df.dtypes))

    # equality within each family (vs the *_old arm)
    fams: dict[str, list[str]] = {}
    for name in noop:
        fams.setdefault(name.split("_")[0], []).append(name)
    eq = {}
    for fam, names in fams.items():
        base = next((n for n in names if n.endswith("_old") or n.endswith("_win")),
                    None)
        if base is None or len(names) < 2:
            continue
        fb = fingerprint(noop[base]())
        for n in names:
            if n != base:
                fn = fingerprint(noop[n]())
                eq[n] = fn == fb
                if fn != fb:
                    print(f"MISMATCH {n}: base={fb} got={fn}", file=sys.stderr)

    samples: dict[str, list[float]] = {}
    arms = list(noop.items()) + list(e2e.items())
    for r in range(reps):
        rot = arms[r % len(arms):] + arms[:r % len(arms)]
        for name, fn in rot:
            spark.sparkContext.setJobDescription(f"{name} rep {r}")
            t0 = time.time()
            if name in e2e:
                fn()
            else:
                fn().write.format("noop").mode("overwrite").save()
            samples.setdefault(name, []).append(round(time.time() - t0, 3))
    print(json.dumps({
        "cpus": cpus, "sf_dir": sf_dir, "equal": eq,
        "best": {k: min(v) for k, v in sorted(samples.items())},
        "samples": samples,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
