"""Pairwise match scoring (SURVEY.md §2.10 F2/J7, M3).

Candidate label pairs -> similarity score via the Arrow-batched kernel in
functions/similarity.py; pairs scoring >= MATCH_THRESHOLD (0.7, the
reference's confidence threshold at link_entities.py:57) become match
edges.

Decision caching (P13/J4): the reference memoizes linking decisions in
SQLite *including negative results* (link_entities.py:308-311) so re-runs
never re-score. Here the decision cache is a table of
(label_a, label_b, score); `score_pairs` left-anti-joins candidates
against it, scores only the misses, and returns the union — re-running on
unchanged input does zero kernel work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from session_graph_spark.functions.similarity import MATCH_THRESHOLD, pair_score

PAIR_KEY = ["label_a", "label_b"]


def score_pairs(pairs: DataFrame, decisions: DataFrame | None = None) -> DataFrame:
    """(label_a, label_b) candidates -> (label_a, label_b, score).

    `decisions` is the resume cache (same 3-column schema); cached pairs —
    positive AND negative — are reused without rescoring.
    """
    if decisions is not None:
        cached = decisions.join(pairs, PAIR_KEY, "left_semi")
        fresh = pairs.join(decisions, PAIR_KEY, "left_anti")
    else:
        cached = None
        fresh = pairs

    scored = fresh.withColumn("score", pair_score(F.col("label_a"), F.col("label_b")))
    if cached is not None:
        scored = scored.unionByName(cached.select("label_a", "label_b", "score"))
    return scored


def match_edges(scored: DataFrame, threshold: float = MATCH_THRESHOLD) -> DataFrame:
    """P8: keep pairs with score >= threshold."""
    return scored.where(F.col("score") >= F.lit(threshold)).select("label_a", "label_b")


def score_distribution(scored: DataFrame, n_bins: int = 20) -> DataFrame:
    """Score histogram (A4 analog / north-rule per-stage metrics)."""
    return (
        scored.withColumn("bin", F.floor(F.col("score") * n_bins) / n_bins)
        .groupBy("bin")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("bin")
    )
