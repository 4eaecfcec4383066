"""Round-7 optimization equivalence pins.

The r7 plan changes must be invisible at the value level:
1. resolve()'s `mentions` (lazy explode of the cached per-turn arrays)
   is row-identical to the direct mentions_from_turns table.
2. resolve()'s single-broadcast-probe mention_clusters is row-identical
   to the former two-join shape (apply_aliases -> inner join clusters).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from session_graph_spark import corpus
from session_graph_spark.functions.normalize import apply_aliases
from session_graph_spark.plans.pipeline import (alias_df,
                                                mention_arrays_from_turns,
                                                mentions_from_turns,
                                                normalized_labels,
                                                prepare_turns, resolve)
from session_graph_spark.operators.extract import explode_mention_arrays


@pytest.fixture(scope="module")
def turns(spark):
    return corpus.generate_turns(spark, n_convs=400, seed=11)


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_array_cache_explode_equals_direct_mentions(spark, turns):
    t = prepare_turns(turns)
    direct = mentions_from_turns(t)
    via_arrays = explode_mention_arrays(mention_arrays_from_turns(t))
    assert via_arrays.columns == direct.columns
    assert _rows(via_arrays) == _rows(direct)


def test_labels_from_arrays_equals_classic(spark, turns):
    from session_graph_spark.plans.pipeline import normalized_labels_from_arrays

    t = prepare_turns(turns)
    aliases = alias_df(spark)
    classic = normalized_labels(mentions_from_turns(t), aliases)
    via_arrays = normalized_labels_from_arrays(
        mention_arrays_from_turns(t), aliases)
    assert via_arrays.columns == classic.columns
    assert _rows(via_arrays) == _rows(classic)


def test_labels_from_arrays_custom_and_empty_alias_dim(spark, turns):
    from session_graph_spark.plans.pipeline import normalized_labels_from_arrays

    t = prepare_turns(turns)
    for rows in ([("k8s", "kubernetes"), ("js", "javascript")], []):
        aliases = spark.createDataFrame(rows, "surface string, canonical string")
        classic = normalized_labels(mentions_from_turns(t), aliases)
        via_arrays = normalized_labels_from_arrays(
            mention_arrays_from_turns(t), aliases)
        assert _rows(via_arrays) == _rows(classic)


def test_mention_clusters_single_probe_equals_two_join(spark, turns):
    res = resolve(spark, turns)
    aliases = alias_df(spark)
    reference = (
        apply_aliases(res.mentions, aliases, label_col="norm_label",
                      out_col="canon_label")
        .join(res.clusters, F.col("canon_label") == F.col("label"), "inner")
        .drop("label")
    )
    assert res.mention_clusters.columns == reference.columns
    assert _rows(res.mention_clusters) == _rows(reference)
    res.unpersist()
