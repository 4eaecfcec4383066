"""Query-layer tests (M6): SPARQL-template equivalents over pipeline output."""

import pytest
from pyspark.sql import functions as F

from session_graph_spark import corpus, queries as Q
from session_graph_spark.plans.pipeline import resolve


@pytest.fixture(scope="module")
def ctx(spark):
    turns = corpus.generate_turns(spark, n_convs=40, seed=42)
    res = resolve(spark, turns)
    return turns, res.mention_clusters.cache()


def test_hub_entities(ctx):
    turns, mc = ctx
    hubs = Q.hub_entities(mc, k=10).collect()
    assert len(hubs) == 10
    degrees = [r["degree"] for r in hubs]
    assert degrees == sorted(degrees, reverse=True)
    # Zipf skew: the top hub covers many conversations
    assert degrees[0] >= 5


def test_entity_lookup(ctx):
    _, mc = ctx
    label = mc.groupBy("canon_label").count().orderBy(F.desc("count")).first()["canon_label"]
    rows = Q.entity_lookup(mc, label).collect()
    assert rows and all(r["canon_label"] == label for r in rows)
    ts = [r["ts"] for r in rows]
    assert ts == sorted(ts)


def test_co_occurrence_antisymmetry(ctx):
    _, mc = ctx
    rows = Q.co_occurrence(mc, k=15).collect()
    assert rows
    assert all(r["entity_a"] < r["entity_b"] for r in rows)


def test_per_platform_counts(ctx):
    _, mc = ctx
    rows = Q.per_platform_counts(mc).collect()
    assert {r["platform"] for r in rows} == set(corpus.PLATFORMS)


def test_cross_platform_overlap(ctx):
    _, mc = ctx
    rows = Q.cross_platform_overlap(mc).collect()
    assert rows, "hot entities must span platforms"
    assert all(r["n_platforms"] > 1 for r in rows)
    assert all("," in r["platforms"] for r in rows)


def test_cross_session_overlap(ctx):
    _, mc = ctx
    rows = Q.cross_session_overlap(mc, min_shared=2, k=10).collect()
    assert all(r["conv_a"] < r["conv_b"] and r["n_shared"] > 2 for r in rows)


def test_tool_usage(ctx):
    turns, _ = ctx
    rows = Q.tool_usage(turns).collect()
    tools = {r["tool"] for r in rows}
    assert tools <= {"Bash", "Edit", "Read", "Write", "Grep"}
    assert all(r["n_calls"] > 0 for r in rows)


def test_project_knowledge_map(ctx):
    turns, mc = ctx
    rows = Q.project_knowledge_map(mc, turns, k=20).collect()
    assert rows and all(r["project"].startswith("proj") for r in rows)


def test_session_timeline(ctx):
    turns, _ = ctx
    rows = Q.session_timeline(turns).collect()
    assert all(r["created"] <= r["modified"] for r in rows)
    assert all(r["n_turns"] >= 3 for r in rows)


def test_two_hop(ctx):
    _, mc = ctx
    label = mc.groupBy("cluster_id").count().orderBy(F.desc("count")).first()["cluster_id"]
    rows = Q.two_hop_neighbors(mc, label, k=10).collect()
    assert all(r["cluster_id"] != label for r in rows)
