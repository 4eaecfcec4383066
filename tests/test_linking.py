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


# ---------------------------------------------------------------------------
# context-aware disambiguation (reference link_entities.py:437-493 builds
# triple contexts, :653-663 feeds them to the linker; spot-check cases are
# the reference's agentic_linker_langgraph.py:234-291 seven, restated as
# (label, co-occurring entity labels) pairs for the deterministic analog)
# ---------------------------------------------------------------------------
CTX_CASES = [
    # (label, context terms, expected kb_id, expect_linked)
    ("python", ["go", "node.js", "backend"], "kb:0001", True),
    ("backend", ["docker", "kubernetes"], "kb:0047", True),
    ("agent", ["claude code", "large language model"], "kb:0210", True),
    ("apis", ["backend", "json"], "kb:0050", True),
    ("neo4j", ["knowledge graph", "cypher"], "kb:0014", True),
    ("k8s", ["docker", "helm"], "kb:0006", True),
    ("js", ["frontend", "react"], "kb:0002", True),
]


def _link_with_ctx(spark, cases):
    labels = spark.createDataFrame([(c[0],) for c in cases], ["label"])
    ctx = spark.createDataFrame([(c[0], c[1]) for c in cases],
                                "label string, context array<string>")
    return {
        r["label"]: r
        for r in link_to_kb(labels, kb_df(spark), context=ctx).collect()
    }


def test_reference_seven_case_spot_check(spark):
    out = _link_with_ctx(spark, CTX_CASES)
    for label, _, kb_id, linked in CTX_CASES:
        assert out[label.lower()]["kb_id"] == kb_id, label
        assert out[label.lower()]["linked"] == linked, label


def test_context_flips_ambiguous_senses(spark):
    """Same exact-match confidence, different winners by evidence: the
    reference's core precision mechanism (7/7 agentic vs ~50% context-free
    heuristic, README.md:56)."""
    cases = [
        ("go", ["kubernetes", "docker"]),        # tech context
        ("mercury", ["postgresql", "python"]),   # tech context
        ("java", ["spring boot", "maven"]),      # tech context
    ]
    out = _link_with_ctx(spark, cases)
    assert out["go"]["kb_id"] == "kb:0004"        # the language
    assert out["mercury"]["kb_id"] == "kb:0209"   # the language, not deity
    assert out["java"]["kb_id"] == "kb:0052"      # the language, not island

    non_tech = [
        ("go", ["board", "game", "stones"]),
        ("python", ["snake", "reptile", "zoo"]),
    ]
    out2 = _link_with_ctx(spark, non_tech)
    assert out2["go"]["kb_id"] == "kb:0204"       # the board game
    assert out2["python"]["kb_id"] == "kb:0205"   # the snake

    # ladder confidence itself is never changed by context
    assert out["go"]["confidence"] == 1.0 and out2["go"]["confidence"] == 1.0


def test_no_context_keeps_reference_tiebreak(spark):
    """Without context, ambiguous exact matches fall back to lowest kb_id
    (select_best_match 'first result' order) — today's behavior."""
    labels = spark.createDataFrame([("go",), ("mercury",), ("agent",)], ["label"])
    out = {r["label"]: r for r in link_to_kb(labels, kb_df(spark)).collect()}
    assert out["go"]["kb_id"] == "kb:0004"
    assert out["mercury"]["kb_id"] == "kb:0051"   # deity has the lower id
    assert out["agent"]["kb_id"] == "kb:0049"


def test_gazetteer_scale():
    """VERDICT r2 item 2: KB dimension grown past 300 entries; ids unique;
    labels/aliases lowercase; no apostrophes (the oracle inlines VALUES);
    ambiguous non-tech senses carry higher ids than their tech twin."""
    from session_graph_spark.operators.linking import KB_ENTRIES

    assert len(KB_ENTRIES) >= 300
    ids = [k for k, _, _, _ in KB_ENTRIES]
    assert len(set(ids)) == len(ids)
    by_label: dict[str, list[str]] = {}
    for kb_id, label, desc, aliases in KB_ENTRIES:
        assert "'" not in label and "'" not in desc
        assert label == label.lower()
        for a in aliases:
            assert "'" not in a and a == a.lower()
        by_label.setdefault(label, []).append(kb_id)
    # ambiguous labels exist and are exercised
    assert len(by_label["go"]) == 2 and len(by_label["mercury"]) == 2


def test_link_metrics_and_rung_traffic(spark):
    """All three ladder rungs + the negative path carry real corpus
    traffic, and link_metrics reports the reference's summary counters
    (link_entities.py:760-786)."""
    from session_graph_spark import corpus
    from session_graph_spark.operators.linking import link_clusters, link_metrics
    from session_graph_spark.plans.pipeline import resolve

    res = resolve(spark, corpus.generate_turns(spark, n_convs=30, seed=42))
    linked = link_clusters(res.clusters).cache()
    rows = {r["cluster_id"]: r for r in linked.collect()}

    assert rows["ecmascript"]["confidence"] == 0.8 and rows["ecmascript"]["linked"]
    assert rows["quicksilver"]["confidence"] == 0.5 and not rows["quicksilver"]["linked"]
    assert rows["zephyrdb"]["confidence"] == 0.0 and rows["zephyrdb"]["kb_id"] is None
    # single-variant entity -> stable min-label canonical -> exact rung
    assert rows["redis"]["confidence"] == 1.0 and rows["redis"]["linked"]

    m = {r["status"]: r for r in link_metrics(linked).collect()}
    assert m["linked"]["n"] > 0
    assert m["below_threshold"]["n"] >= 1       # quicksilver
    assert m["not_found"]["n"] >= 2             # zephyrdb, quantafold
    total = sum(r["n"] for r in m.values())
    assert total == linked.count()
    assert abs(sum(float(r["share"]) for r in m.values()) - 1.0) < 0.01
    linked.unpersist()


def test_link_metrics_cache_hits(spark):
    from session_graph_spark.operators.linking import link_metrics

    labels = spark.createDataFrame([("python",), ("redis",)], ["label"])
    cache = spark.createDataFrame(
        [("python", "kb:0001", "python", "d", 1.0, True)],
        "label string, kb_id string, kb_label string, description string, "
        "confidence double, linked boolean",
    )
    out = link_to_kb(labels, kb_df(spark), cache=cache)
    m = {r["status"]: r["n"] for r in link_metrics(out, cache=cache).collect()}
    assert m["cache_hit"] == 1 and m["linked"] == 2


def test_kb_enrichment_join(spark):
    """Federated-template analog (reference README.md:311-324): linked
    labels joined back to KB description + aliases."""
    from session_graph_spark.operators.linking import kb_enrichment

    labels = spark.createDataFrame(
        [("python",), ("k8s",), ("zzz-not-a-thing",)], ["label"])
    linked = link_to_kb(labels, kb_df(spark))
    out = {r["label"]: r for r in kb_enrichment(linked, kb_df(spark)).collect()}
    assert set(out) == {"python", "k8s"}  # unlinked labels excluded
    assert out["python"]["aliases_csv"] == "cpython,py"
    assert out["k8s"]["kb_label"] == "kubernetes"
    assert "orchestration" in out["k8s"]["description"]


def test_external_kb_dimension(spark, tmp_path):
    """kb_df(path=...) loads a parquet KB dimension with the same schema;
    the linker machinery is dimension-agnostic — a 5k-entry generated KB
    (a superset of the curated entries plus 4,550 synthetic ones) links
    the curated labels identically AND resolves labels only the external
    dimension knows."""
    from session_graph_spark.operators.linking import KB_ENTRIES, KB_SCHEMA

    rows = [(k, lbl, d, list(a)) for k, lbl, d, a in KB_ENTRIES]
    rows += [
        (f"kb:9{i:04d}", f"extlib{i}",
         "synthetic library for distributed processing",
         [f"xl{i}"])
        for i in range(4550)
    ]
    path = str(tmp_path / "kb5k")
    spark.createDataFrame(rows, KB_SCHEMA).write.parquet(path)

    ext = kb_df(spark, path=path)
    assert ext.count() == len(rows)

    labels = spark.createDataFrame(
        [("python",), ("k8s",), ("extlib42",), ("xl7",), ("zzz-nope",)],
        ["label"],
    )
    small = {r["label"]: r for r in link_to_kb(labels, kb_df(spark)).collect()}
    big = {r["label"]: r for r in link_to_kb(labels, ext).collect()}
    # curated labels: identical decision at both dimensions
    for lbl in ("python", "k8s", "zzz-nope"):
        assert (small[lbl]["kb_id"], small[lbl]["confidence"],
                small[lbl]["linked"]) == \
               (big[lbl]["kb_id"], big[lbl]["confidence"], big[lbl]["linked"])
    # external-only labels resolve against the big dimension
    assert big["extlib42"]["kb_id"] == "kb:90042" and big["extlib42"]["confidence"] == 1.0
    assert big["xl7"]["kb_id"] == "kb:90007" and big["xl7"]["confidence"] == 0.8
    assert small["extlib42"]["linked"] is False
    # schema validation rejects a wrong table
    bad = str(tmp_path / "bad")
    spark.createDataFrame([(1,)], ["x"]).write.parquet(bad)
    with pytest.raises(ValueError, match="lacks columns"):
        kb_df(spark, path=bad)
    # ... and a right-names/wrong-TYPES table (aliases as a csv string)
    # fails at load, not deep inside a linker explode
    badtype = str(tmp_path / "badtype")
    spark.createDataFrame(
        [("kb:1", "x", "d", "a,b")],
        "kb_id string, kb_label string, description string, aliases string",
    ).write.parquet(badtype)
    with pytest.raises(ValueError, match="aliases has type string"):
        kb_df(spark, path=badtype)


def test_kbgen_vocab_validation_is_loud():
    """The 0.5-rung keyword-leak invariant is a ValueError (survives
    python -O, unlike the round-5 assert) and is checked once at import
    over the vocabularies instead of per generated row."""
    from session_graph_spark import kbgen

    kbgen._validate_nontech_vocab()  # current vocabularies are clean
    orig = kbgen._NONTECH_NOUN
    kbgen._NONTECH_NOUN = [*orig, "databasefolk"]  # planted leak
    try:
        with pytest.raises(ValueError, match="tech keywords"):
            kbgen._validate_nontech_vocab()
    finally:
        kbgen._NONTECH_NOUN = orig


def test_generated_gazetteer_dimension(spark, tmp_path):
    """The realistic 30k-entry generated gazetteer (kbgen): structural
    invariants, every linker rung reachable, multi-sense collisions at
    natural density resolved by the context re-ranker, and curated labels
    linking IDENTICALLY under the big dimension (superset property)."""
    from session_graph_spark import kbgen
    from session_graph_spark.operators.linking import (KB_ENTRIES,
                                                       TECH_KEYWORDS)

    rows = kbgen.generate_kb_rows(n=2000, seed=7)
    assert len(rows) >= len(KB_ENTRIES) + 2000
    # determinism + id uniqueness + curated prefix preserved
    assert rows[:len(KB_ENTRIES)] == [
        (k, lbl, d, list(a)) for k, lbl, d, a in KB_ENTRIES]
    assert rows == kbgen.generate_kb_rows(n=2000, seed=7)
    ids = [r[0] for r in rows]
    assert len(set(ids)) == len(ids)
    # multi-sense collisions at natural density; tech sense = lowest id
    from collections import Counter
    by_label = Counter(r[1] for r in rows)
    gen_multi = [lbl for lbl, c in by_label.items() if c > 1
                 and any(r[0].startswith("kbx:9") for r in rows if r[1] == lbl)]
    assert 2000 * 0.04 <= len(gen_multi) <= 2000 * 0.15
    descs = {r[0]: r[2] for r in rows}
    for lbl in gen_multi[:20]:
        lo, hi = sorted(r[0] for r in rows if r[1] == lbl)[:2]
        assert any(kw in descs[lo] for kw in TECH_KEYWORDS)
        assert not any(kw in descs[hi] for kw in TECH_KEYWORDS)

    path = str(tmp_path / "kb30k")
    n_written = kbgen.write_kb(spark, path, n=2000, seed=7)
    big = kb_df(spark, path=path)
    assert big.count() == n_written == len(rows)

    # rung coverage on generated entries: exact -> 1.0, alias -> 0.8,
    # non-tech -> 0.5 (found but below threshold)
    tech = next(r for r in rows if r[0].startswith("kbx:1")
                and "folklore" not in r[2] and r[3])
    nontech = next(r for r in rows if r[0].startswith("kbx:1")
                   and "folklore" in r[2])
    probe = spark.createDataFrame(
        [(tech[1],), (tech[3][0],), (nontech[1],)], ["label"])
    got = {r["label"]: r for r in link_to_kb(probe, big).collect()}
    assert got[tech[1]]["confidence"] == 1.0 and got[tech[1]]["linked"]
    assert got[tech[3][0]]["confidence"] == 0.8 and got[tech[3][0]]["linked"]
    assert got[nontech[1]]["confidence"] == 1.0  # exact label still 1.0

    # ambiguous generated label: context-free -> tech (lower id) sense;
    # non-tech context evidence flips it
    amb = gen_multi[0]
    lo_id, hi_id = sorted(r[0] for r in rows if r[1] == amb)[:2]
    probe2 = spark.createDataFrame([(amb,)], ["label"])
    free = link_to_kb(probe2, big).collect()[0]
    assert free["kb_id"] == lo_id
    hi_desc_words = [w for w in descs[hi_id].split() if len(w) > 3][:3]
    ctx = spark.createDataFrame([(amb, hi_desc_words)],
                                "label string, context array<string>")
    steered = link_to_kb(probe2, big, context=ctx).collect()[0]
    assert steered["kb_id"] == hi_id

    # superset property: curated labels link identically vs curated dim
    curated_probe = spark.createDataFrame(
        [("python",), ("k8s",), ("go",), ("quicksilver",), ("zzz-nope",)],
        ["label"])
    small = {r["label"]: r for r in link_to_kb(curated_probe, kb_df(spark)).collect()}
    under_big = {r["label"]: r for r in link_to_kb(curated_probe, big).collect()}
    for lbl in small:
        assert (small[lbl]["kb_id"], small[lbl]["confidence"],
                small[lbl]["linked"]) == \
               (under_big[lbl]["kb_id"], under_big[lbl]["confidence"],
                under_big[lbl]["linked"]), lbl


def test_kb_pipeline_composite_under_large_dimension(spark, tmp_path):
    """The end-to-end KB composite (resolve -> per-cluster context ->
    link -> counters: the driver's kb_pipeline flow, reference
    link_entities.py main flow) runs green with the full 30k generated
    gazetteer wired in via kb_df(path=...), and every cluster the
    curated dimension could see (confidence > 0) links IDENTICALLY —
    extra generated entries may only add links to previously not-found
    clusters, never change or remove curated ones."""
    from session_graph_spark import kbgen
    from session_graph_spark.operators.linking import kb_df, link_clusters
    from session_graph_spark.operators.triples import entity_context
    from session_graph_spark.plans.pipeline import resolve
    from session_graph_spark.sources.testdata import documents_as_turns

    res = resolve(spark, documents_as_turns(spark, "/root/testdata/sf0.001"))
    ctx = entity_context(
        res.mention_clusters.select(
            "conv_id", "turn_idx", F.col("cluster_id").alias("canon_label"))
    )
    path = str(tmp_path / "kb30k")
    kbgen.write_kb(spark, path, n=30000, seed=7)

    linked_small = {r["cluster_id"]: r for r in
                    link_clusters(res.clusters, kb_df(spark),
                                  context=ctx).collect()}
    linked_big = {r["cluster_id"]: r for r in
                  link_clusters(res.clusters, kb_df(spark, path=path),
                                context=ctx).collect()}
    assert set(linked_big) == set(linked_small) != set()
    for cid, s in linked_small.items():
        if s["confidence"] > 0:
            b = linked_big[cid]
            assert (b["kb_id"], b["confidence"], b["linked"]) == \
                   (s["kb_id"], s["confidence"], s["linked"]), cid
    n_small = sum(1 for r in linked_small.values() if r["linked"])
    n_big = sum(1 for r in linked_big.values() if r["linked"])
    assert n_big >= n_small


def test_link_clusters_consumes_context(spark):
    """link_clusters feeds entity_context evidence through to the linker
    (reference link_entities.py:653-663)."""
    from session_graph_spark.operators.linking import link_clusters

    clusters = spark.createDataFrame(
        [("go", "go"), ("golang", "go"), ("mercury", "mercury")],
        ["label", "cluster_id"],
    )
    ctx = spark.createDataFrame(
        [("go", ["kubernetes", "docker"]), ("mercury", ["prolog", "haskell"])],
        "canon_label string, context array<string>",
    )
    out = {r["cluster_id"]: r for r in
           link_clusters(clusters, context=ctx).collect()}
    assert out["go"]["kb_id"] == "kb:0004"
    assert out["mercury"]["kb_id"] == "kb:0209"  # tech context -> language
