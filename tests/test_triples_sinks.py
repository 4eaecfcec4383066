"""Knowledge-triple construction, context aggregation, Turtle sink, and a
streaming windowed-aggregation smoke test."""

import pytest
from pyspark.sql import functions as F

from session_graph_spark import corpus
from session_graph_spark.operators.triples import (build_triples, entity_context,
                                                   hub_by_triple_degree)
from session_graph_spark.plans.pipeline import (alias_df, mentions_from_turns,
                                                prepare_turns)
from session_graph_spark.functions.normalize import apply_aliases


@pytest.fixture(scope="module")
def ctx(spark):
    turns = corpus.generate_turns(spark, n_convs=20, seed=42)
    prepared = prepare_turns(turns)
    mentions = apply_aliases(
        mentions_from_turns(prepared), alias_df(spark), "norm_label", "canon_label"
    ).cache()
    return prepared, mentions


def test_build_triples(spark, ctx):
    turns, mentions = ctx
    t = build_triples(mentions, turns)
    edges, reified = t["edges"].cache(), t["reified"].cache()
    assert edges.count() > 0
    assert set(edges.columns) == {"subject", "predicate", "object"}
    # predicates coerced into the closed vocabulary
    from session_graph_spark.data import PREDICATE_VOCABULARY
    preds = {r["predicate"] for r in edges.select("predicate").distinct().collect()}
    assert preds <= set(PREDICATE_VOCABULARY)
    assert len(preds) > 1, "cue detection should produce more than relatedTo"
    # reified rows carry provenance + deterministic 12-char ids
    r = reified.first()
    assert len(r["triple_id"]) == 12 and r["conv_id"].startswith("conv-")
    # determinism
    t2 = build_triples(mentions, turns)
    assert sorted(map(tuple, t2["reified"].select("triple_id").collect())) == \
           sorted(map(tuple, reified.select("triple_id").collect()))


def _mention_rows(spark, conv, labels):
    return spark.createDataFrame(
        [(conv, 0, lbl, i, None) for i, lbl in enumerate(labels)],
        "conv_id string, turn_idx int, canon_label string, pos int, ts timestamp",
    )


def _turn_row(spark, conv, text):
    return spark.createDataFrame(
        [(conv, 0, text, None)],
        "conv_id string, turn_idx int, text string, ts timestamp",
    )


def test_per_pair_cue_predicates(spark):
    """A turn with two cues must emit DIFFERENT predicates for its two
    mention pairs (the reference chooses a predicate per triple, not per
    turn): 'X uses Y. Z solves W.' -> uses(X,Y) and solves(Z,W)."""
    turns = _turn_row(
        spark, "c1", "alpha uses beta for ingest. gamma solves delta nicely.")
    mentions = _mention_rows(spark, "c1", ["alpha", "beta", "gamma", "delta"])
    edges = build_triples(mentions, turns)["edges"]
    got = {(r["subject"], r["object"]): r["predicate"] for r in edges.collect()}
    assert got[("alpha", "beta")] == "uses"
    assert got[("gamma", "delta")] == "solves"
    # the cross-sentence pair has no cue between beta and gamma: the
    # nearest cue to its LEFT ('uses') applies
    assert got[("beta", "gamma")] == "uses"
    # single-cue turn still applies that cue; cueless falls back
    turns2 = _turn_row(spark, "c2", "alpha requires beta and gamma together here ok.")
    mentions2 = _mention_rows(spark, "c2", ["alpha", "beta", "gamma"])
    got2 = {(r["subject"], r["object"]): r["predicate"]
            for r in build_triples(mentions2, turns2)["edges"].collect()}
    assert got2 == {("alpha", "beta"): "requires", ("beta", "gamma"): "requires"}


def test_cue_assignment_by_char_offset(spark):
    """Cue order != pair order must not misassign predicates (reference
    triple_extraction.py:348-374 picks the predicate per triple): in
    'A and B; C uses D' the single LATE cue belongs to the (C,D) pair
    only — index alignment would have stamped 'uses' on (A,B) too."""
    turns = _turn_row(spark, "c1", "alpha and beta; gamma uses delta")
    mentions = _mention_rows(spark, "c1", ["alpha", "beta", "gamma", "delta"])
    got = {(r["subject"], r["object"]): r["predicate"]
           for r in build_triples(mentions, turns)["edges"].collect()}
    assert got[("alpha", "beta")] == "relatedTo"
    assert got[("gamma", "delta")] == "uses"
    assert got[("beta", "gamma")] == "relatedTo"  # no cue at or left of it

    # a cue only to the RIGHT of every mention applies to nothing
    turns2 = _turn_row(spark, "c2", "alpha beta and then it uses things")
    mentions2 = _mention_rows(spark, "c2", ["alpha", "beta"])
    got2 = {(r["subject"], r["object"]): r["predicate"]
            for r in build_triples(mentions2, turns2)["edges"].collect()}
    assert got2 == {("alpha", "beta"): "relatedTo"}

    # repeated cues: each pair takes the cue inside its own span
    turns3 = _turn_row(spark, "c3", "alpha uses beta and gamma requires delta")
    mentions3 = _mention_rows(spark, "c3", ["alpha", "beta", "gamma", "delta"])
    got3 = {(r["subject"], r["object"]): r["predicate"]
            for r in build_triples(mentions3, turns3)["edges"].collect()}
    assert got3[("alpha", "beta")] == "uses"
    assert got3[("gamma", "delta")] == "requires"
    assert got3[("beta", "gamma")] == "uses"  # nearest-left fallback


def test_cue_offset_substring_and_repeated_labels(spark):
    """Offset recovery must survive labels that are substrings of other
    mentions and labels that repeat within the turn (self-review
    findings): 'alphabeta talks to alpha' must not collapse both offsets
    onto position 1, and the object's occurrence is the first one AFTER
    the subject."""
    # prefix-substring: locate('alpha') alone would hit 'alphabeta'
    turns = _turn_row(spark, "c1", "alphabeta talks to alpha")
    mentions = _mention_rows(spark, "c1", ["alphabeta", "alpha"])
    got = {(r["subject"], r["object"]): r["predicate"]
           for r in build_triples(mentions, turns)["edges"].collect()}
    assert got == {("alphabeta", "alpha"): "integratesWith"}

    # repeated label: pair (gamma, alpha) must use alpha's SECOND
    # occurrence, keeping 'needs' instead of stealing 'uses'
    turns2 = _turn_row(spark, "c2", "alpha uses beta. gamma needs alpha")
    mentions2 = _mention_rows(spark, "c2", ["alpha", "beta", "gamma"])
    # the (gamma, alpha) pair arises when alpha re-enters as the next
    # mention pair: simulate with explicit positions
    mentions2 = spark.createDataFrame(
        [("c2", 0, "alpha", 0, None), ("c2", 0, "beta", 1, None),
         ("c2", 0, "gamma", 2, None), ("c2", 0, "alpha", 3, None)],
        "conv_id string, turn_idx int, canon_label string, pos int, ts timestamp",
    )
    got2 = {(r["subject"], r["object"]): r["predicate"]
            for r in build_triples(mentions2, turns2)["edges"].collect()}
    assert got2[("alpha", "beta")] == "uses"
    assert got2[("gamma", "alpha")] == "requires"  # 'needs' -> requires

    # inseparable offsets (label only occurs inside the other): order
    # fallback keeps the cue rather than dropping it
    turns3 = _turn_row(spark, "c3", "alphabeta uses gammadelta")
    mentions3 = _mention_rows(spark, "c3", ["alphabeta", "alpha"])
    got3 = {(r["subject"], r["object"]): r["predicate"]
            for r in build_triples(mentions3, turns3)["edges"].collect()}
    assert got3 == {("alphabeta", "alpha"): "uses"}


def test_cue_offset_alias_fallback(spark):
    """A canonical label that never appears in the surface text (alias
    normalization: k8s -> kubernetes) has no recoverable offset; the pair
    falls back to order-based cue alignment instead of losing its cue."""
    turns = _turn_row(spark, "c1", "k8s uses docker here")
    mentions = _mention_rows(spark, "c1", ["kubernetes", "docker"])
    got = {(r["subject"], r["object"]): r["predicate"]
           for r in build_triples(mentions, turns)["edges"].collect()}
    assert got == {("kubernetes", "docker"): "uses"}


def test_extractor_carried_offsets_fix_alias_cue(spark):
    """Round-6: when mentions carry the extractor's true char offsets,
    an alias-normalized mention (k8s -> kubernetes, canonical absent
    from the text) gets the offset-correct predicate instead of the
    order-based fallback. Text 'alpha beta k8s uses redis': the late
    cue belongs ONLY to (kubernetes, redis); order alignment would
    stamp 'uses' on (beta, kubernetes) too [pair 1 takes cue
    min(2, 1) = 'uses']."""
    turns = _turn_row(spark, "c1", "alpha beta k8s uses redis")
    mentions = spark.createDataFrame(
        # off = 1-based offsets of alpha/beta/k8s/redis in the text;
        # kubernetes carries the SURFACE k8s's offset (12), exactly what
        # extract_mentions(with_offsets=True) + apply_aliases produce
        [("c1", 0, "alpha", 0, None, 1), ("c1", 0, "beta", 1, None, 7),
         ("c1", 0, "kubernetes", 2, None, 12), ("c1", 0, "redis", 3, None, 21)],
        "conv_id string, turn_idx int, canon_label string, pos int, "
        "ts timestamp, off int",
    )
    got = {(r["subject"], r["object"]): r["predicate"]
           for r in build_triples(mentions, turns)["edges"].collect()}
    assert got[("kubernetes", "redis")] == "uses"
    assert got[("alpha", "beta")] == "relatedTo"
    # the alias pair that the order fallback used to mis-stamp
    assert got[("beta", "kubernetes")] == "relatedTo"


def test_offsets_flow_from_real_extraction_to_triples(spark):
    """End-to-end: extract_mentions(with_offsets=True) -> apply_aliases ->
    build_triples uses carried offsets (no locate fallback). '--uses' is
    L1-rejected as a mention but still matches the cue regex, so the cue
    sits strictly between the aliased subject and its object."""
    raw = spark.createDataFrame(
        [("c1", 0, "claude-code", None, "alpha beta and k8s --uses redis")],
        "conv_id string, turn_idx int, platform string, ts timestamp, text string",
    )
    from session_graph_spark.operators.extract import extract_mentions

    mentions = apply_aliases(extract_mentions(raw, with_offsets=True),
                             alias_df(spark), "norm_label", "canon_label")
    assert "off" in mentions.columns
    by_label = {r["canon_label"]: r for r in mentions.collect()}
    assert "kubernetes" in by_label, "alias k8s -> kubernetes must apply"
    assert by_label["kubernetes"]["off"] == 16  # points at the k8s surface
    got = {(r["subject"], r["object"]): r["predicate"]
           for r in build_triples(mentions, raw)["edges"].collect()}
    assert got[("kubernetes", "redis")] == "uses"
    assert got[("alpha", "beta")] == "relatedTo"


def test_locate_fallback_boundary_guard(spark):
    """ADVICE r5: offset-less mentions whose label first-locates INSIDE
    another word ('java' inside 'javascript') must not use that embedded
    occurrence as span evidence — (java, react) would steal 'requires'
    from the (javascript, node) pair; the boundary guard drops it to
    order alignment, which picks 'uses'."""
    turns = _turn_row(spark, "c1", "javascript requires node. java uses react")
    mentions = _mention_rows(spark, "c1", ["javascript", "node", "java", "react"])
    got = {(r["subject"], r["object"]): r["predicate"]
           for r in build_triples(mentions, turns)["edges"].collect()}
    assert got[("javascript", "node")] == "requires"
    assert got[("java", "react")] == "uses"


def test_hub_by_triple_degree(spark, ctx):
    turns, mentions = ctx
    edges = build_triples(mentions, turns)["edges"]
    hubs = hub_by_triple_degree(edges, k=5).collect()
    assert len(hubs) == 5
    d = [r["degree"] for r in hubs]
    assert d == sorted(d, reverse=True)


def test_entity_context(spark, ctx):
    _, mentions = ctx
    ec = entity_context(mentions, max_terms=5)
    rows = ec.collect()
    assert rows
    for r in rows:
        assert 1 <= len(r["context"]) <= 5
        assert r["canon_label"] not in r["context"]


def test_turtle_sink(spark, ctx, tmp_path):
    from session_graph_spark.sources.sinks import write_turtle

    turns, mentions = ctx
    reified = build_triples(mentions, turns)["reified"]
    out = str(tmp_path / "graph.ttl")
    write_turtle(reified, out)
    text = spark.read.text(out)
    assert text.where(F.col("value").startswith("@prefix")).count() >= 3
    n_triples = reified.count()
    assert text.where(F.col("value").contains("devkg:KnowledgeTriple")).count() == n_triples
    # direct edge + reified node per triple (dual storage)
    assert text.where(F.col("value").startswith("data:entity/")).count() == n_triples


def test_serving_table_sink(spark, ctx, tmp_path):
    from session_graph_spark.sources.sinks import write_serving_table

    _, mentions = ctx
    n = write_serving_table(mentions.limit(10), str(tmp_path / "serve"), 10)
    assert n == 10
    # the verify counts only the APPENDED batch (delta files), so its cost
    # — and its value — is independent of the existing table size
    n2 = write_serving_table(mentions.limit(10), str(tmp_path / "serve"), 10)
    assert n2 == 10
    total = spark.read.parquet(str(tmp_path / "serve")).count()
    assert total == 20  # append semantics preserved
    with pytest.raises(RuntimeError):
        write_serving_table(mentions.limit(3), str(tmp_path / "serve"), 5)


def test_uri_scheme_classification(spark, ctx, tmp_path):
    """Scheme detection drives the verify strategy: single-slash Hadoop
    URI forms (hdfs:/x, s3a:/x) are NOT driver-listable and must route to
    the count-delta fallback — the old '://' test misclassified them and
    failed successful writes. A file:/ URI over a local dir exercises the
    fallback end-to-end."""
    from session_graph_spark.sources.sinks import (_has_uri_scheme,
                                                   write_serving_table)

    for p in ("hdfs:/x", "hdfs://nn/x", "s3a:/bucket/k", "file:/tmp/t",
              "s3a://bucket/k", "abfss://c@a.dfs.core.windows.net/p"):
        assert _has_uri_scheme(p), p
    for p in ("/data/serve", "relative/dir", "serve"):
        assert not _has_uri_scheme(p), p

    _, mentions = ctx
    uri = "file:" + str(tmp_path / "serve_uri")
    n = write_serving_table(mentions.limit(7), uri, 7)
    assert n == 7
    n2 = write_serving_table(mentions.limit(7), uri, 7)
    assert n2 == 7  # delta count, not cumulative


def test_streaming_windowed_agg(spark, tmp_path):
    """ST smoke: file-source stream -> watermark + tumbling window agg ->
    memory sink, drained synchronously with AvailableNow."""
    src = str(tmp_path / "stream_in")
    events = spark.createDataFrame(
        [(i, corpus.PLATFORMS[i % 5]) for i in range(100)], ["i", "platform"]
    ).select(
        F.col("platform"),
        (F.to_timestamp(F.lit("2026-01-05 08:00:00"))
         + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.col("i") * 60.0)).alias("ts"),
    )
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("platform string, ts timestamp").parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "30 minutes"), "platform")
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append").format("memory")
        .queryName("windowed_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM windowed_counts").collect()
    # append mode emits only windows closed by the watermark
    assert got, "expected closed windows"
    assert all(r["n"] > 0 for r in got)


def test_turtle_escaping_and_prefixes(spark, tmp_path):
    """The .ttl output must declare every prefix it uses (rdf: was missing
    in round 1) and escape quotes/backslashes in literals."""
    from session_graph_spark.sources.sinks import PREFIXES, turtle_lines

    assert "@prefix rdf:" in PREFIXES
    reified = spark.createDataFrame(
        [("postgres", "uses", "docker", 'conv-"quoted"\\backslash', 0, "abc123def456")],
        ["subject", "predicate", "object", "conv_id", "turn_idx", "triple_id"],
    )
    line = turtle_lines(reified).collect()[0]["value"]
    # every literal " inside the emitted string is escaped as \"
    assert '\\"quoted\\"' in line
    assert "\\\\backslash" in line
    # no bare unescaped quote inside the literal (the value between the
    # devkg:extractedFrom quotes parses as one token)
    lit = line.split('devkg:extractedFrom "', 1)[1].rsplit('" .', 1)[0]
    i, bare = 0, False
    while i < len(lit):
        if lit[i] == "\\":
            i += 2
            continue
        if lit[i] == '"':
            bare = True
        i += 1
    assert not bare
