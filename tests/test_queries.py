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
    # session title = first user turn's text (truncated 80), the
    # reference's session-node metadata (warp_to_rdf.py:136-146)
    first_user = (
        turns.where(F.col("role") == "user")
        .orderBy("conv_id", "turn_idx").first()
    )
    by_conv = {r["conv_id"]: r for r in rows}
    assert by_conv[first_user["conv_id"]]["title"] == first_user["text"][:80]
    assert all(len(r["title"] or "") <= 80 for r in rows)


def test_exact_edges_channels(spark):
    """Both deterministic identity channels fire: alias dictionary edges
    and slug-equality pairs (reference common.py:29-37)."""
    from session_graph_spark.operators.blocking import exact_edges
    from session_graph_spark.plans.pipeline import alias_df

    mentions = spark.createDataFrame(
        [("k8s",), ("kubernetes",), ("node.js",), ("node-js",), ("redis",)],
        ["norm_label"],
    )
    rows = {(r["label_a"], r["label_b"], r["channel"])
            for r in exact_edges(mentions, alias_df(spark)).collect()}
    assert ("k8s", "kubernetes", "alias") in rows
    # node-js is unknown to the alias dim but slug-collides with node.js
    assert ("node-js", "node.js", "slug") in rows
    assert not any("redis" in (a, b) for a, b, _ in rows)


def test_two_hop(ctx):
    _, mc = ctx
    label = mc.groupBy("cluster_id").count().orderBy(F.desc("count")).first()["cluster_id"]
    rows = Q.two_hop_neighbors(mc, label, k=10).collect()
    assert all(r["cluster_id"] != label for r in rows)


@pytest.fixture(scope="module")
def edges(spark, ctx):
    from session_graph_spark.operators.triples import build_triples

    turns, mc = ctx
    return build_triples(mc, turns)["edges"].cache()


def test_predicate_search(edges):
    """Template 3: hand-check against a direct filter of the edge table."""
    pred = edges.groupBy("predicate").count().orderBy(F.desc("count")).first()["predicate"]
    ent = edges.where(F.col("predicate") == pred).first()["subject"]
    rows = Q.predicate_search(edges, pred, ent).collect()
    assert rows
    assert all(ent in r["subject"] or ent in r["object"] for r in rows)
    want = {
        (r["subject"], r["object"])
        for r in edges.where(F.col("predicate") == pred).collect()
        if ent in r["subject"] or ent in r["object"]
    }
    assert {(r["subject"], r["object"]) for r in rows} == want


def test_entity_to_entity(edges):
    e = edges.first()
    rows = Q.entity_to_entity(edges, e["subject"], e["object"]).collect()
    preds = {r["predicate"] for r in rows}
    assert e["predicate"] in preds
    want = {
        r["predicate"] for r in edges.collect()
        if e["subject"] in r["subject"] and e["object"] in r["object"]
    }
    assert preds == want


def test_path_discovery(edges):
    """2-hop connectivity: a->mid->b path planted by taking two chained
    edges; results must include it and never echo the endpoints as mid."""
    e1 = edges.first()
    hop2 = edges.where(
        (F.col("subject") == e1["object"]) & (F.col("object") != e1["subject"])
    ).first()
    if hop2 is None:
        pytest.skip("corpus produced no 2-hop chain from the first edge")
    x, y, mid = e1["subject"], hop2["object"], e1["object"]
    rows = Q.path_discovery(edges, x, y).collect()
    assert any(r["mid"] == mid for r in rows)
    assert all(x not in r["mid"] and y not in r["mid"] for r in rows)


def test_sibling_entities(edges):
    # pick an x that provably has a sibling: a (predicate, object) pair
    # with >= 2 distinct subjects
    shared = (
        edges.groupBy("predicate", "object")
        .agg(F.countDistinct("subject").alias("n"))
        .where(F.col("n") >= 2).first()
    )
    x = edges.where(
        (F.col("predicate") == shared["predicate"])
        & (F.col("object") == shared["object"])
    ).first()["subject"]
    rows = Q.sibling_entities(edges, x).collect()
    assert rows
    # every sibling shares (predicate, shared) with one of x's edges
    x_edges = {
        (r["predicate"], r["object"])
        for r in edges.where(F.col("subject").contains(x)).collect()
    }
    for r in rows:
        assert (r["predicate"], r["shared"]) in x_edges
        assert not r["sibling"] == x


def test_two_hop_neighbors_pruned_plan(ctx):
    """The co-mention expansion must be pruned by hop1 BEFORE the big
    self-join (round-1 finding: full O(sum d_c^2) shuffle)."""
    _, mc = ctx
    label = mc.first()["cluster_id"]
    plan = Q.two_hop_neighbors(mc, label)._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan


def test_topic_search(ctx):
    turns, mc = ctx
    topic = mc.first()["canon_label"][:4]
    rows = Q.topic_search(mc, turns, topic).collect()
    assert rows
    want = {
        r["conv_id"]
        for r in mc.where(F.col("canon_label").contains(topic))
        .select("conv_id").distinct().collect()
    }
    assert {r["conv_id"] for r in rows} == want
    created = [r["created"] for r in rows]
    assert created == sorted(created)


def test_registry_first_50_pinned():
    """The driver's correctness gate reads the registry's FIRST 50
    entries (CORRECTNESS rows == positions 1-50; round-4/6 convention).
    Pin that set and order so a future insertion cannot silently
    displace an oracle-checked query past the window (ADVICE r6)."""
    import __spark_entry__ as E

    expected_first_50 = [
        "er_clusters", "er_mentions", "er_labels", "er_edges_exact",
        "pair_scores_cached", "session_overlap", "triple_hubs",
        "er_incremental", "er_resume", "kb_pipeline", "kb_linking",
        "kb_linking_ctx", "kb_linking_cached", "kb_federation",
        "minhash_dedup_pairs", "minhash_dedup_groups", "simhash_dedup",
        "ngram_bucket_dedup", "exact_dedup", "embedding_neardup",
        "ann_topk", "ann_lsh_topk", "ann_ivf_topk", "text_features",
        "lang_stats", "media_features", "hub_entities", "cooccurrence",
        "cross_source_overlap", "min_sessions_filter", "platform_counts",
        "predicate_search", "entity_to_entity", "path_discovery",
        "sibling_entities", "topic_search", "turn_ordering", "prev_event",
        "sessionization", "event_type_rollup", "pricing_summary",
        "claude_jsonl_scan", "warp_sqlite_scan", "deepseek_zip_scan",
        "grok_json_scan", "tool_events_scan", "message_parents_scan",
        "turtle_roundtrip", "serving_table_sink", "streaming_state",
    ]
    names = list(E.queries())
    assert names[:50] == expected_first_50
    # every registry entry has an oracle (matched by name, not order)
    assert set(E.oracle_sql()) == set(names)
