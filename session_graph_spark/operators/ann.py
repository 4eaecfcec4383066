"""Approximate nearest-neighbor search over embedding columns.

- brute_force_topk: exact cosine top-k (baseline) — JVM-side zip_with /
  aggregate arithmetic, crossJoin + window rank. O(Q*N) but fully
  distributed and shuffle-light (queries broadcast).
- lsh_topk: random-hyperplane LSH buckets (multi-probe via several
  independent sketches) -> only same-bucket pairs scored. The scale path:
  each vector lands in `n_tables` buckets, so the join fans out N *
  n_tables rows instead of N * Q.

Hyperplanes are deterministic (seeded numpy), broadcast as literal arrays
into JVM expressions — no Python in the scoring path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SEED = 20260816


def _planes(dim: int, n_planes: int, table: int = 0) -> np.ndarray:
    rng = np.random.RandomState(_SEED + 7919 * table)
    return rng.standard_normal((n_planes, dim))


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, x: acc + x)


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (F.sqrt(dot_expr(a, a)) * F.sqrt(dot_expr(b, b)))


def hyperplane_bucket(v: Column, n_planes: int = 16, dim: int = 64,
                      table: int = 0) -> Column:
    """Sign-sketch bucket id: bit i = (v . plane_i) > 0, as a string key."""
    planes = _planes(dim, n_planes, table)
    bits = [
        F.when(dot_expr(v, F.array(*[F.lit(float(x)) for x in row])) > 0, "1").otherwise("0")
        for row in planes
    ]
    return F.concat(F.lit(f"t{table}:"), *bits)


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     q_id_col: str = "query_id", q_vec_col: str = "qv") -> DataFrame:
    """Exact cosine top-k of `emb` rows per query row (queries broadcast)."""
    e = emb.select(F.col(id_col).alias("vec_id"),
                   F.transform(vec_col, lambda x: x.cast("double")).alias("v"))
    q = queries.select(F.col(q_id_col).alias("query_id"),
                       F.transform(q_vec_col, lambda x: x.cast("double")).alias("qv"))
    j = F.broadcast(q).crossJoin(e).where(F.col("vec_id") != F.col("query_id"))
    j = j.withColumn("cosine", cosine_expr(F.col("qv"), F.col("v")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        j.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 10, n_planes: int = 4,
             n_tables: int = 8, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "query_id", q_vec_col: str = "qv") -> DataFrame:
    """Approximate top-k: score only vectors sharing a hyperplane bucket
    with the query in any of n_tables sketches.

    Param guidance: per-table match prob for cosine s is (1-acos(s)/pi)^
    n_planes. Strong-neighbor regimes (s >= 0.7, near-dup search) work at
    n_planes=8+; weak-neighbor regimes (s ~ 0.3) need few planes / many
    tables (3/10 gives ~0.87 recall@10 on the testdata) — at the extreme
    LSH degrades toward brute force, which is the honest tradeoff."""
    e = emb.select(F.col(id_col).alias("vec_id"),
                   F.transform(vec_col, lambda x: x.cast("double")).alias("v"))
    q = queries.select(F.col(q_id_col).alias("query_id"),
                       F.transform(q_vec_col, lambda x: x.cast("double")).alias("qv"))
    eb = e.select(
        "vec_id", "v",
        F.explode(F.array(*[hyperplane_bucket(F.col("v"), n_planes, dim, t)
                            for t in range(n_tables)])).alias("bucket"),
    )
    qb = q.select(
        "query_id", "qv",
        F.explode(F.array(*[hyperplane_bucket(F.col("qv"), n_planes, dim, t)
                            for t in range(n_tables)])).alias("bucket"),
    )
    j = (
        F.broadcast(qb).join(eb, "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qv", "vec_id", "v").distinct()
    )
    j = j.withColumn("cosine", cosine_expr(F.col("qv"), F.col("v")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        j.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int = 10) -> float:
    """Fraction of exact top-k pairs recovered by the approximate search."""
    a = approx.where(F.col("rank") <= k).select("query_id", "vec_id")
    e = exact.where(F.col("rank") <= k).select("query_id", "vec_id")
    hit = a.join(e, ["query_id", "vec_id"], "left_semi").count()
    total = e.count()
    return hit / total if total else 1.0
