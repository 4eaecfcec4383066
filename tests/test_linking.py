"""KB-linking tests: the confidence ladder, threshold, negative caching,
and sameAs output — mirroring the reference's linker spot check
(agentic_linker_langgraph.py:234-291) and ladder semantics
(link_entities.py:517-545)."""

import pytest
from pyspark.sql import functions as F

from session_graph_spark.operators.linking import (CONFIDENCE_THRESHOLD, kb_df,
                                                   link_to_kb, same_as_edges)

# the reference main()'s seven entities, minus context strings (our
# deterministic linker doesn't consume context), plus ladder edge cases
CASES = ["python", "backend", "agent", "apis", "neo4j", "k8s", "js",
         "hg", "zzz-not-a-thing", "Spark"]


@pytest.fixture(scope="module")
def linked(spark):
    labels = spark.createDataFrame([(c,) for c in CASES], ["label"])
    return {
        r["label"]: r
        for r in link_to_kb(labels, kb_df(spark), label_col="label").collect()
    }


def test_exact_match_rung(linked):
    # exact label match -> confidence 1.0 (reference :531-532)
    for lbl, kb in [("python", "kb:0001"), ("backend", "kb:0047"),
                    ("agent", "kb:0049"), ("neo4j", "kb:0014")]:
        assert linked[lbl]["confidence"] == 1.0
        assert linked[lbl]["kb_id"] == kb and linked[lbl]["linked"]


def test_tech_keyword_rung(linked):
    # alias candidate whose description carries a tech keyword -> 0.8
    assert linked["k8s"]["confidence"] == 0.8
    assert linked["k8s"]["kb_id"] == "kb:0006" and linked["k8s"]["linked"]
    assert linked["js"]["confidence"] == 0.8
    assert linked["js"]["kb_id"] == "kb:0002"
    assert linked["apis"]["confidence"] == 0.8
    assert linked["apis"]["kb_id"] == "kb:0050"


def test_low_confidence_rejected(linked):
    # alias candidate with a non-tech description -> 0.5 < 0.7: candidate
    # exists but the link is rejected (threshold, reference :57)
    assert linked["hg"]["confidence"] == 0.5
    assert not linked["hg"]["linked"] and linked["hg"]["kb_id"] is None


def test_negative_decision_recorded(linked):
    # no candidate at all -> confidence 0.0 row still present (negative
    # caching semantics, reference :308-311)
    r = linked["zzz-not-a-thing"]
    assert r["confidence"] == 0.0 and not r["linked"] and r["kb_id"] is None


def test_case_insensitive(linked):
    assert linked["spark"]["kb_id"] == "kb:0015"  # 'Spark' lowercased, alias


def test_cache_short_circuits(spark):
    """Cached decisions — including negatives — are reused verbatim and
    their labels never re-join the KB."""
    labels = spark.createDataFrame([("python",), ("redis",)], ["label"])
    poisoned = spark.createDataFrame(
        [("python", "kb:9999", "poisoned", "d", 1.0, True)],
        "label string, kb_id string, kb_label string, description string, "
        "confidence double, linked boolean",
    )
    out = {r["label"]: r for r in
           link_to_kb(labels, kb_df(spark), cache=poisoned).collect()}
    assert out["python"]["kb_id"] == "kb:9999"  # cache wins, no re-link
    assert out["redis"]["kb_id"] == "kb:0012"   # uncached label still links


def test_same_as_edges(spark):
    labels = spark.createDataFrame([(c,) for c in CASES], ["label"])
    linked = link_to_kb(labels, kb_df(spark))
    edges = {r["label"]: r["same_as"] for r in same_as_edges(linked).collect()}
    assert edges["python"] == "kb:0001"
    assert "hg" not in edges and "zzz-not-a-thing" not in edges
    assert CONFIDENCE_THRESHOLD == 0.7


def test_link_clusters_end_to_end(spark):
    """Reference pipeline order: ER clustering first, then the link step
    over cluster canonicals (one decision per cluster)."""
    from session_graph_spark import corpus
    from session_graph_spark.operators.linking import link_clusters
    from session_graph_spark.plans.pipeline import resolve

    res = resolve(spark, corpus.generate_turns(spark, n_convs=20, seed=42))
    out = link_clusters(res.clusters)
    rows = {r["cluster_id"]: r for r in out.collect()}
    # one decision per distinct cluster canonical
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    assert len(rows) == n_clusters
    # planted canonicals that exist in the KB must link
    for known in ("python", "kubernetes", "postgresql"):
        if known in rows:
            assert rows[known]["linked"], known
