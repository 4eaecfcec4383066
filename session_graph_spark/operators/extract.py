"""Deterministic mention extraction (SURVEY.md §2.10 F1).

The reference extracts knowledge triples per assistant message with an LLM
(triple_extraction.py:524-579) and then normalizes/validates/caps them.
That is non-deterministic (20% inter-model overlap, CLAUDE.md:249), so the
replicable spec — and what we implement — is the deterministic part: a
gazetteer + token candidate generator followed by the same normalization
(N2) and L1 validity filter (P5), capped at 10 mentions per turn in
occurrence-priority order (T1, triple_extraction.py:508-512).

Runs as `mapInPandas` over Arrow batches: phrase matching and tokenization
are vectorized pandas `.str` ops; one output row per extracted mention
(UDTF shape: 1 row in -> 0..10 rows out).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from session_graph_spark.data import ALIAS_MAP
from session_graph_spark.functions.filters import is_valid_entity_pd

MAX_MENTIONS_PER_TURN = 10
EXTRACT_INPUT_MAX_CHARS = 1500  # reference truncates extraction input (N7)

# phrase gazetteer: multi-word / dotted surface forms from the alias
# dimension (both surface and canonical sides)
_PHRASES = sorted(
    {s for kv in ALIAS_MAP.items() for s in kv if (" " in s or "." in s)},
    key=len,
    reverse=True,
)


def _trie_pattern(words: list[str]) -> str:
    """Common-prefix-factored alternation (trie regex).

    A flat `a|b|c|...` alternation costs O(|dictionary|) alternative
    probes per text position in both Java and CPython regex engines — the
    scan gets linearly slower every time the alias dimension grows. The
    trie form bounds per-position cost by the trie's branching factor
    instead. Branches are disjoint by construction (first differing
    char), and a node that is both a word-end and a prefix emits a greedy
    optional suffix, so the longest phrase still wins — the same
    semantics as a longest-first alternation."""
    trie: dict = {}
    for w in words:
        node = trie
        for ch in w:
            node = node.setdefault(ch, {})
        node["\0"] = {}  # end-of-word marker

    def emit(node: dict) -> str:
        end = "\0" in node
        alts = [re.escape(ch) + emit(child)
                for ch, child in sorted(node.items()) if ch != "\0"]
        if not alts:
            return ""
        if len(alts) == 1:
            return alts[0] if not end else "(?:" + alts[0] + ")?"
        return "(?:" + "|".join(alts) + (")?" if end else ")")

    return emit(trie)


# text is lowercased before matching (IGNORECASE costs ~3x in CPython re)
_PHRASE_RE = re.compile(
    r"(?<![\w.])(" + _trie_pattern(_PHRASES) + r")(?!\w)"
)
_TOKEN_RE = re.compile(r"\S+")

MENTION_SCHEMA = (
    "conv_id string, turn_idx int, platform string, ts timestamp, "
    "mention string, norm_label string, mention_id string, pos int"
)


def _normalize_series(s: pd.Series) -> pd.Series:
    """pandas mirror of functions.normalize.normalize_entity (N2)."""
    s = s.str.strip().str.lower()
    s = s.str.replace(r"\s+", " ", regex=True)
    # strip the same trailing punctuation set as normalize_entity (the
    # reference's rstrip('.,;:') — '!' and '?' are NOT stripped)
    return s.str.replace(r"[.,;:]+$", "", regex=True)


def extract_mentions_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """One Arrow batch of turns -> mention rows."""
    if len(pdf) == 0:
        return pd.DataFrame(
            columns=["conv_id", "turn_idx", "platform", "ts", "mention",
                     "norm_label", "mention_id", "pos"]
        )
    # lowercase once up front: phrase matching avoids IGNORECASE and the
    # downstream normalize/filter work on mention strings sees lowercase
    # (normalize_entity lowercases anyway, so semantics are unchanged)
    text = pdf["text"].fillna("").str.slice(0, EXTRACT_INPUT_MAX_CHARS).str.lower()
    phrases = text.str.findall(_PHRASE_RE)
    residual = text.str.replace(_PHRASE_RE, " ", regex=True)
    tokens = residual.str.findall(_TOKEN_RE)

    base = pdf[["conv_id", "turn_idx", "platform", "ts"]].copy()
    # phrase hits are known dictionary entries: they bypass L1 (whitelist
    # semantics — otherwise the filename rule would reject 'node.js');
    # loose tokens go through the full L1 validity filter. Phrases are
    # prepended so they win the per-turn cap — a single explode keeps that
    # order without a concat+sort over the exploded frame.
    base["mention"] = phrases + tokens
    base["n_ph"] = phrases.str.len()
    out = base.explode("mention", ignore_index=False)
    out = out[out["mention"].notna()]
    if len(out) == 0:
        return (out.reset_index(drop=True)
                .assign(norm_label=[], mention_id=[], pos=[])
                .drop(columns=["n_ph"]))
    out["is_phrase"] = out.groupby(level=0).cumcount() < out["n_ph"]
    out = out.reset_index(drop=True)

    out["norm_label"] = _normalize_series(out["mention"].astype(str))
    out = out[out["is_phrase"] | is_valid_entity_pd(out["norm_label"])]
    # dedupe within turn (set semantics, U2) keeping first occurrence,
    # then cap at 10 (T1)
    out = out.drop_duplicates(["conv_id", "turn_idx", "norm_label"])
    out["pos"] = out.groupby(["conv_id", "turn_idx"]).cumcount()
    out = out[out["pos"] < MAX_MENTIONS_PER_TURN].reset_index(drop=True)
    out["mention_id"] = (
        out["conv_id"].astype(str) + "|"
        + out["turn_idx"].astype(str) + "|"
        + out["pos"].astype(str)
    )
    out["pos"] = out["pos"].astype("int32")
    out["turn_idx"] = out["turn_idx"].astype("int32")
    out = out.drop(columns=["n_ph", "is_phrase"])
    return out[["conv_id", "turn_idx", "platform", "ts", "mention",
                "norm_label", "mention_id", "pos"]]


def extract_mentions_pandas(turns: DataFrame) -> DataFrame:
    """Arrow-batched pandas implementation (the UDTF-shaped F1 form).

    Kept as the reference implementation; `extract_mentions_sql` is
    equivalence-tested against it and is the default in the pipeline.
    """
    cols = ["conv_id", "turn_idx", "platform", "ts", "text"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            yield extract_mentions_batch(pdf)

    return turns.select(*cols).mapInPandas(run, schema=MENTION_SCHEMA)


def extract_mentions_sql(turns: DataFrame) -> DataFrame:
    """Pure-JVM extraction: regexp_extract_all for the phrase gazetteer,
    split for tokens, higher-order array ops for normalize/L1-filter/
    first-occurrence-dedup/cap — all per-row inside whole-stage codegen,
    zero shuffle, no Python workers. Emits mention = normalized label
    (the pandas form keeps the raw surface; nothing downstream reads it).
    """
    from pyspark.sql import functions as F

    from session_graph_spark.functions.filters import is_valid_entity_col

    java_phrase_re = _PHRASE_RE.pattern  # lookarounds are valid Java regex
    lower_text = F.lower(F.substring("text", 1, EXTRACT_INPUT_MAX_CHARS))

    t = turns.select(
        "conv_id", "turn_idx", "platform", "ts",
        F.regexp_extract_all(lower_text, F.lit(java_phrase_re), 1).alias("ph"),
        F.regexp_replace(lower_text, java_phrase_re, " ").alias("resid"),
    )
    toks = F.filter(F.split("resid", r"\s+"), lambda x: x != "")
    cands = F.concat("ph", toks)
    n_ph = F.size("ph")

    def norm(x):
        y = F.regexp_replace(F.trim(x), r"\s+", " ")
        return F.regexp_replace(y, r"[.,;:]+$", "")

    normed = F.transform(cands, norm)
    kept = F.filter(
        normed,
        lambda x, i: (i < n_ph) | is_valid_entity_col(x),
    )
    deduped = F.slice(F.array_distinct(kept), 1, MAX_MENTIONS_PER_TURN)
    out = t.select(
        "conv_id", "turn_idx", "platform", "ts",
        F.posexplode(deduped).alias("pos", "norm_label"),
    )
    return out.select(
        "conv_id", "turn_idx", "platform", "ts",
        F.col("norm_label").alias("mention"),
        "norm_label",
        F.concat_ws("|", "conv_id", "turn_idx", "pos").alias("mention_id"),
        F.col("pos").cast("int").alias("pos"),
    )


def extract_mentions(turns: DataFrame, engine: str = "sql") -> DataFrame:
    """turns (post P3/P4/P9 filters) -> mentions DataFrame.

    Input must have columns conv_id, turn_idx, platform, ts, text.
    engine='sql' (default): whole-stage-codegen column expressions.
    engine='pandas': the Arrow-batched UDF form (same output modulo the
    raw `mention` surface column; equivalence-tested).
    """
    if engine == "pandas":
        return extract_mentions_pandas(turns)
    return extract_mentions_sql(turns)
