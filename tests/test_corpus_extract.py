"""M0 corpus determinism + M1 extraction behavior + the per-row invariant."""

import pandas as pd
from pyspark.sql import functions as F

from session_graph_spark import corpus
from session_graph_spark.operators.extract import extract_mentions_batch
from session_graph_spark.plans.pipeline import mentions_from_turns, prepare_turns


def test_corpus_deterministic():
    a = corpus.generate_turns_pdf(n_convs=30, seed=42)
    b = corpus.generate_turns_pdf(n_convs=30, seed=42)
    pd.testing.assert_frame_equal(a, b)
    c = corpus.generate_turns_pdf(n_convs=30, seed=43)
    assert not a["text"].equals(c["text"])


def test_corpus_shape_and_noise():
    pdf = corpus.generate_turns_pdf(n_convs=40)
    assert set(pdf.columns) >= {"conv_id", "turn_idx", "role", "text", "tool", "ts",
                                "platform", "source_file"}
    assert (pdf.groupby("conv_id")["turn_idx"].apply(lambda s: (s.sort_values().values
            == range(len(s))).all())).all(), "turn_idx must be dense 0..n-1"
    assert pdf["source_file"].str.contains("/subagents/").any()
    assert (pdf["text"].str.len() < 30).any()
    assert (pdf["text"].str.len() > 2000).any()
    assert set(pdf["platform"]) == set(corpus.PLATFORMS)


def test_extract_batch_finds_planted_and_rejects_noise():
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": [1, 3, 1],
            "platform": ["claude-code"] * 3,
            "ts": pd.to_datetime(["2026-01-01"] * 3),
            "text": [
                "I migrated the service from postgres to kubernetes using k8s "
                "manifests under config.json with --force and 280px of #8776f6.",
                "short",  # no planted mentions; generic tokens only
                "The fast api layer wraps sqlalchemy; vs code debugs it via node.js.",
            ],
        }
    )
    out = extract_mentions_batch(pdf)
    labels = set(out["norm_label"])
    assert {"postgres", "kubernetes", "k8s"} <= labels
    assert {"fast api", "sqlalchemy", "vs code", "node.js"} <= labels
    assert not labels & {"config.json", "--force", "280px", "#8776f6"}
    # cap: <= 10 mentions per turn, positions dense from 0
    per_turn = out.groupby(["conv_id", "turn_idx"])["pos"]
    assert (per_turn.max() <= 9).all()
    assert (per_turn.min() == 0).all()
    # mention_id is deterministic
    out2 = extract_mentions_batch(pdf)
    assert list(out["mention_id"]) == list(out2["mention_id"])


def test_sql_extraction_equals_pandas(spark):
    """The whole-stage-codegen extraction must decide identically to the
    Arrow-batched pandas form on (conv_id, turn_idx, norm_label, pos)."""
    from session_graph_spark.operators.extract import (extract_mentions_pandas,
                                                       extract_mentions_sql)

    turns = corpus.generate_turns(spark, n_convs=25, seed=42)
    base = turns.where(
        (F.col("role") == "assistant") & (F.length(F.trim("text")) >= 30)
    ).select("conv_id", "turn_idx", "platform", "ts", "text")
    cols = ["conv_id", "turn_idx", "norm_label", "pos"]
    a = sorted(map(tuple, extract_mentions_sql(base).select(*cols).collect()))
    b = sorted(map(tuple, extract_mentions_pandas(base).select(*cols).collect()))
    assert len(a) > 500
    only_sql = set(a) - set(b)
    only_pd = set(b) - set(a)
    assert not only_sql and not only_pd, (
        f"sql-only: {sorted(only_sql)[:10]} pandas-only: {sorted(only_pd)[:10]}"
    )


def test_extract_offsets_point_at_surface():
    """with_offsets=True: every emitted offset must index the mention's
    raw surface in the lowered truncated text (1-based), for phrase hits,
    residual tokens after phrase collapse, and punctuation-normalized
    tokens alike."""
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c2"],
            "turn_idx": [1, 1],
            "platform": ["claude-code"] * 2,
            "ts": pd.to_datetime(["2026-01-01"] * 2),
            "text": [
                # phrase ('vs code', 'node.js') + tokens; trailing-punct
                # normalization; token AFTER a phrase needs the collapse
                # shift mapped back to original coordinates
                "We debug vs code with postgres, then node.js runs redis.",
                "kubernetes via k8s manifests; fast api wraps sqlalchemy",
            ],
        }
    )
    out = extract_mentions_batch(pdf, with_offsets=True)
    assert len(out) > 5 and out["off"].notna().all()
    texts = {("c1", 1): pdf["text"][0].lower(), ("c2", 1): pdf["text"][1].lower()}
    for r in out.itertuples(index=False):
        t = texts[(r.conv_id, r.turn_idx)]
        surface = str(r.mention)
        got = t[r.off - 1 : r.off - 1 + len(surface)]
        assert got == surface, (r.norm_label, r.off, got, surface)


def test_offsets_surface_property_random_texts():
    """Property: for ANY text built from tokens, phrases, and punctuation,
    every mention's offset indexes its raw surface in the lowered
    truncated text (pure-pandas path; the SQL form is separately
    bit-matched against it)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abkz.", min_size=1, max_size=6)
    piece = st.one_of(word, st.sampled_from(
        ["vs code", "node.js", "fast api", "k8s", "alpha,", "beta.", "  "]))
    texts = st.lists(
        st.lists(piece, min_size=1, max_size=25).map(" ".join),
        min_size=1, max_size=8)

    @settings(max_examples=60, deadline=None)
    @given(texts)
    def run(tt):
        pdf = pd.DataFrame({
            "conv_id": [f"c{i}" for i in range(len(tt))],
            "turn_idx": [1] * len(tt),
            "platform": ["p"] * len(tt),
            "ts": pd.to_datetime(["2026-01-01"] * len(tt)),
            "text": tt,
        })
        out = extract_mentions_batch(pdf, with_offsets=True)
        low = {f"c{i}": t[:1500].lower() for i, t in enumerate(tt)}
        for r in out.itertuples(index=False):
            s = str(r.mention)
            got = low[r.conv_id][r.off - 1 : r.off - 1 + len(s)]
            assert got == s, (r.conv_id, s, r.off, got)

    run()


def test_sql_offsets_equal_pandas(spark):
    """The JVM locate-fold offsets must bit-match the pandas find-walk on
    a corpus slice PLUS handcrafted rows exercising the tricky paths
    (multiple phrase hits, tokens after phrases, repeated substrings,
    trailing punctuation)."""
    from session_graph_spark.operators.extract import (extract_mentions_pandas,
                                                       extract_mentions_sql)

    hard = spark.createDataFrame(
        [
            ("h1", 1, "p", None,
             "vs code and node.js: vs code again, alphabeta alpha beta."),
            ("h2", 1, "p", None,
             "fast api wraps fast api; k8s talks to kubernetes via k8s."),
            ("h3", 1, "p", None, "   leading space  postgres   redis "),
            ("h4", 1, "p", None, "x" * 2000 + " postgres"),  # truncation
        ],
        "conv_id string, turn_idx int, platform string, ts timestamp, text string",
    )
    turns = corpus.generate_turns(spark, n_convs=15, seed=7)
    base = turns.where(
        (F.col("role") == "assistant") & (F.length(F.trim("text")) >= 30)
    ).select("conv_id", "turn_idx", "platform", "ts", "text").unionByName(hard)
    cols = ["conv_id", "turn_idx", "norm_label", "pos", "off"]
    a = sorted(map(tuple, extract_mentions_sql(base, with_offsets=True)
                   .select(*cols).collect()))
    b = sorted(map(tuple, extract_mentions_pandas(base, with_offsets=True)
                   .select(*cols).collect()))
    assert len(a) > 300
    only_sql = set(a) - set(b)
    only_pd = set(b) - set(a)
    assert not only_sql and not only_pd, (
        f"sql-only: {sorted(only_sql)[:10]} pandas-only: {sorted(only_pd)[:10]}"
    )


def test_offset_and_default_paths_agree_on_mentions(spark):
    """with_offsets must never change WHICH mentions are extracted — only
    add the off column (the default ER path keeps the round-5 plan)."""
    from session_graph_spark.operators.extract import extract_mentions_sql

    turns = corpus.generate_turns(spark, n_convs=10, seed=11)
    base = turns.where(F.col("role") == "assistant").select(
        "conv_id", "turn_idx", "platform", "ts", "text")
    cols = ["conv_id", "turn_idx", "norm_label", "pos"]
    plain = sorted(map(tuple, extract_mentions_sql(base).select(*cols).collect()))
    offs = sorted(map(tuple, extract_mentions_sql(base, with_offsets=True)
                      .select(*cols).collect()))
    assert plain == offs


def test_extraction_spark_roundtrip_and_invariant(spark):
    turns = corpus.generate_turns(spark, n_convs=12)
    # per-row invariant: per-turn text equality under stable ordering after
    # a round trip through prepare_turns (the pipeline's turn table)
    prepared = prepare_turns(turns)
    src = turns.where(~F.col("source_file").contains("/subagents/")) \
               .orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text")
    rt = prepared.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text")
    assert [r.asDict() for r in src.collect()] == [r.asDict() for r in rt.collect()]

    mentions = mentions_from_turns(prepared)
    got = mentions.groupBy().agg(F.count("*"), F.countDistinct("norm_label")).collect()[0]
    assert got[0] > 0 and got[1] > 10
    # extraction only from assistant turns (P4): join back and check roles
    joined = mentions.join(turns.select("conv_id", "turn_idx", "role"),
                           ["conv_id", "turn_idx"])
    assert joined.where(F.col("role") != "assistant").count() == 0
