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
# dimension (both surface and canonical sides), longest first so e.g.
# "visual studio code" wins over "studio".
_PHRASES = sorted(
    {s for kv in ALIAS_MAP.items() for s in kv if (" " in s or "." in s)},
    key=len,
    reverse=True,
)
# text is lowercased before matching (IGNORECASE on a 60-way alternation
# costs ~3x in CPython re)
_PHRASE_RE = re.compile(
    r"(?<![\w.])(" + "|".join(re.escape(p) for p in _PHRASES) + r")(?!\w)"
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
    return s.str.replace(r"[.,;:!?]+$", "", regex=True)


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

    base = pdf[["conv_id", "turn_idx", "platform", "ts"]]
    # phrase hits are known dictionary entries: they bypass L1 (whitelist
    # semantics — otherwise the filename rule would reject 'node.js');
    # loose tokens go through the full L1 validity filter. Phrases come
    # first so they win the per-turn cap.
    ph = base.assign(mention=phrases, is_phrase=True).explode("mention", ignore_index=True)
    tk = base.assign(mention=tokens, is_phrase=False).explode("mention", ignore_index=True)
    out = pd.concat([ph, tk], ignore_index=True)
    out = out[out["mention"].notna()]
    if len(out) == 0:
        return out.assign(norm_label=[], mention_id=[], pos=[]).drop(columns=["is_phrase"])

    out["norm_label"] = _normalize_series(out["mention"].astype(str))
    out = out[out["is_phrase"] | is_valid_entity_pd(out["norm_label"])]
    out = out.sort_values(["conv_id", "turn_idx", "is_phrase"],
                          ascending=[True, True, False], kind="stable")
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
    return out[["conv_id", "turn_idx", "platform", "ts", "mention",
                "norm_label", "mention_id", "pos"]]


def extract_mentions(turns: DataFrame) -> DataFrame:
    """turns (post P3/P4/P9 filters) -> mentions DataFrame.

    Input must have columns conv_id, turn_idx, platform, ts, text.
    """
    cols = ["conv_id", "turn_idx", "platform", "ts", "text"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            yield extract_mentions_batch(pdf)

    return turns.select(*cols).mapInPandas(run, schema=MENTION_SCHEMA)
