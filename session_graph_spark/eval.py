"""Pairwise-F1 evaluation against labeled surface pairs (BASELINE.json metric).

A labeled pair (surface_a, surface_b, is_match) is predicted a match iff
the pipeline assigns both normalized surfaces (after the same alias
normalization the pipeline applies) to the same cluster_id.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from session_graph_spark.functions.normalize import apply_aliases


@dataclass
class PairwiseScores:
    tp: int
    fp: int
    fn: int
    tn: int

    @property
    def precision(self) -> float:
        return self.tp / (self.tp + self.fp) if (self.tp + self.fp) else 1.0

    @property
    def recall(self) -> float:
        return self.tp / (self.tp + self.fn) if (self.tp + self.fn) else 1.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0


def pairwise_f1(
    clusters: DataFrame, labeled_pairs: DataFrame, aliases: DataFrame
) -> PairwiseScores:
    """clusters: (label, cluster_id); labeled_pairs: (surface_a, surface_b,
    is_match). Surfaces are alias-normalized before cluster lookup so the
    evaluation sees exactly what the pipeline clusters."""
    def canon(side: str) -> DataFrame:
        df = labeled_pairs.select(F.col(f"surface_{side}").alias("norm_label"))
        return (
            apply_aliases(df.distinct(), aliases, "norm_label", "canon_label")
            .withColumnRenamed("norm_label", f"surface_{side}")
            .withColumnRenamed("canon_label", f"canon_{side}")
        )

    lp = (
        labeled_pairs
        .join(canon("a"), "surface_a")
        .join(canon("b"), "surface_b")
        .join(
            clusters.select(F.col("label").alias("canon_a"), F.col("cluster_id").alias("cid_a")),
            "canon_a", "left",
        )
        .join(
            clusters.select(F.col("label").alias("canon_b"), F.col("cluster_id").alias("cid_b")),
            "canon_b", "left",
        )
        .withColumn(
            "pred",
            F.col("cid_a").isNotNull() & (F.col("cid_a") == F.col("cid_b")),
        )
    )
    agg = lp.agg(
        F.sum(F.when(F.col("is_match") & F.col("pred"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("is_match") & F.col("pred"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("is_match") & ~F.col("pred"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~F.col("is_match") & ~F.col("pred"), 1).otherwise(0)).alias("tn"),
    ).collect()[0]
    return PairwiseScores(tp=int(agg["tp"]), fp=int(agg["fp"]), fn=int(agg["fn"]), tn=int(agg["tn"]))
