"""Capture `.explain("formatted")` for every plan round 7 touches, into
plans/r07/<name>_<tag>.txt (tag = before|after, from argv[1]).

Covers the headline ER pipeline's sequential stages (the bench's
er_pipeline / er_pipeline_warm / er_pipeline_sf1 rows all run this exact
plan) plus the query-layer rows the round touches.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def explain_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    outdir = os.path.join(REPO, "plans", "r07")
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from session_graph_spark import corpus
    from session_graph_spark.functions.normalize import apply_aliases
    from session_graph_spark.operators.blocking import candidate_pairs
    from session_graph_spark.operators.scoring import score_pairs
    from session_graph_spark.plans.pipeline import (alias_df,
                                                    mentions_from_turns,
                                                    normalized_labels,
                                                    prepare_turns, resolve)
    from session_graph_spark.session import get_spark

    spark = get_spark(app_name="r7_plans", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def dump(name: str, df) -> None:
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(explain_str(df))

    # --- headline ER pipeline stages (corpus turns, the bench input) ----
    n_convs = 180_000
    path = f"/tmp/spark_graft_corpus_{corpus.corpus_cache_key(n_convs, 42)}"
    turns = prepare_turns(spark.read.parquet(path))
    aliases = alias_df(spark)

    mentions_plan = mentions_from_turns(turns)
    dump("er_mentions_stage", mentions_plan)

    # labels over the UNCACHED mention plan (the cache node would hide
    # the subtree in formatted explain)
    labels_plan = normalized_labels(mentions_plan, aliases)
    dump("er_labels_stage", labels_plan)

    # the fast-path labels form resolve() actually runs (r7 pass 3: the
    # alias-map probe is guarded by an InSet test — visible as
    # `CASE WHEN x INSET (...) THEN element_at(map...) ELSE x` in the
    # per-conv transform, replacing the bare linear element_at walk)
    from session_graph_spark.operators.extract import extract_mention_arrays
    from session_graph_spark.plans.pipeline import normalized_labels_from_arrays
    dump("er_labels_arrays_stage",
         normalized_labels_from_arrays(extract_mention_arrays(
             turns.where((F.col("role") == "assistant")
                         & (F.length(F.trim(F.col("text"))) >= 30))
             .select("conv_id", "turn_idx", "platform", "ts", "text")),
             aliases))

    # the end-to-end resolve (cached stages appear as InMemoryRelation)
    res = resolve(spark, turns)
    dump("er_mention_clusters", res.mention_clusters)
    dump("er_scored", res.pairs_scored)
    res.unpersist()
    spark.catalog.clearCache()

    # --- query-layer rows the round examines ----------------------------
    sf = "/root/testdata/sf0.01"
    for q in ["hub_entities", "cooccurrence", "text_features",
              "sessionization", "ann_topk", "pricing_summary"]:
        dump(q, E.queries()[q](spark, sf))

    # kb_link stage as the bench times it (distinct doc labels vs the
    # curated KB). The _before capture for this one was produced from
    # the round-6 window form inlined in scripts/r7_query_variants2.py
    # (kb_win), since the plan dump script gained this entry mid-round.
    from session_graph_spark.operators.linking import kb_df, link_to_kb
    doc_labels = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("label"))
        .where(F.length("label") >= 3).distinct()
    )
    dump("kb_link", link_to_kb(doc_labels, kb_df(spark)))

    print(f"wrote plans to {outdir} (tag={tag})")
    spark.stop()


if __name__ == "__main__":
    main()
