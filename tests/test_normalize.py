"""Unit tests for scalar normalizers (N1-N7) — run on Spark Columns."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from session_graph_spark.functions import normalize as N


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Apache Spark", "apache-spark"),
        ("  Node.js!! ", "node-js"),
        ("K8s", "k8s"),
        ("--force", "force"),
        ("a__b  c", "a-b-c"),
    ],
)
def test_slug(spark, raw, expected):
    assert _one(spark, N.slug(F.lit(raw))) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("  FastAPI,  ", "fastapi"),
        ("Machine   Learning.", "machine learning"),
        ("redis;:", "redis"),
        ("PostgreSQL", "postgresql"),
    ],
)
def test_normalize_entity(spark, raw, expected):
    assert _one(spark, N.normalize_entity(F.lit(raw))) == expected


def test_normalize_predicates(spark):
    from session_graph_spark.data import predicate_rows

    vocab = spark.createDataFrame(predicate_rows(), ["predicate"])
    df = spark.createDataFrame(
        [("dependsOn",), ("depends_on",), ("Depends On",), ("depends-on",),
         ("DEPENDSON",), ("totally_unknown_pred",), ("uses",)],
        ["predicate"],
    )
    got = [r["predicate"] for r in N.normalize_predicates(df, vocab).collect()]
    assert sorted(got) == sorted(
        ["dependsOn", "dependsOn", "dependsOn", "dependsOn", "dependsOn",
         "relatedTo", "uses"]
    )


def test_apply_aliases(spark):
    aliases = spark.createDataFrame(
        [("k8s", "kubernetes"), ("js", "javascript")], ["surface", "canonical"]
    )
    df = spark.createDataFrame([("k8s",), ("js",), ("rust",)], ["norm_label"])
    got = {r["norm_label"]: r["canon_label"] for r in N.apply_aliases(df, aliases).collect()}
    assert got == {"k8s": "kubernetes", "js": "javascript", "rust": "rust"}


def test_timestamps(spark):
    iso = _one(spark, N.ts_from_iso(F.lit("2026-01-05T08:00:00+02:00")))
    assert iso == datetime(2026, 1, 5, 6, 0, 0)  # UTC session timezone
    ms = _one(spark, N.ts_from_epoch_millis(F.lit("1767600000000")))
    assert ms.replace(tzinfo=timezone.utc).timestamp() == 1767600000.0


def test_hashes_and_truncation(spark):
    h = _one(spark, N.content_hash(F.lit("hello")))
    assert len(h) == 16 and h == h.lower()
    tid = _one(spark, N.stable_id(F.lit("s"), F.lit("p"), F.lit("o")))
    tid2 = _one(spark, N.stable_id(F.lit("s"), F.lit("p"), F.lit("o")))
    assert tid == tid2 and len(tid) == 12
    assert _one(spark, N.truncate(F.lit("x" * 3000), 2000)) == "x" * 2000
