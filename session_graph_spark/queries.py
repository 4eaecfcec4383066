"""Query layer (M6): DataFrame implementations of the reference's SPARQL
templates (SURVEY.md §2.4-J9, §2.5; pipeline/sample_queries.sparql,
.claude/skills/devkg-sparql/SKILL.md templates 1-14).

All functions take the engine's tables (mention_clusters: one row per
mention occurrence with conv_id, platform, ts, canon_label, cluster_id;
turns: the canonical input table) and return DataFrames. Every aggregate
column is aliased so results are oracle-comparable.

Top-k queries order by (metric DESC, key ASC) — the deterministic tiebreak
the reference gets implicitly from SPARQL's stable serialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_lookup(mentions: DataFrame, label: str) -> DataFrame:
    """Template 1: all occurrences of one entity (bidirectional in the
    reference's subject∪object sense; our mention table is role-free)."""
    return (
        mentions.where(F.col("canon_label") == label)
        .select("conv_id", "platform", "ts", "canon_label", "cluster_id")
        .orderBy("ts")
    )


def hub_entities(mentions: DataFrame, k: int = 20) -> DataFrame:
    """Template 10 / A5: top-k entities by distinct-conversation degree."""
    return (
        mentions.groupBy("cluster_id")
        .agg(F.countDistinct("conv_id").alias("degree"),
             F.count("*").alias("n_mentions"))
        .orderBy(F.desc("degree"), F.asc("cluster_id"))
        .limit(k)
    )


def co_occurrence(mentions: DataFrame, k: int = 20) -> DataFrame:
    """Q8 / A6: entity pairs co-mentioned in the same conversation."""
    m = mentions.select("conv_id", "cluster_id").distinct()
    a = m.select("conv_id", F.col("cluster_id").alias("entity_a"))
    b = m.select("conv_id", F.col("cluster_id").alias("entity_b"))
    return (
        a.join(b, "conv_id")
        .where(F.col("entity_a") < F.col("entity_b"))
        .groupBy("entity_a", "entity_b")
        .agg(F.count("*").alias("n_convs"))
        .orderBy(F.desc("n_convs"), F.asc("entity_a"), F.asc("entity_b"))
        .limit(k)
    )


def per_platform_counts(mentions: DataFrame) -> DataFrame:
    """Q9/Q11 / A7: conversations and mentions per platform."""
    return (
        mentions.groupBy("platform")
        .agg(F.countDistinct("conv_id").alias("n_convs"),
             F.count("*").alias("n_mentions"))
        .orderBy("platform")
    )


def cross_platform_overlap(mentions: DataFrame, k: int = 20) -> DataFrame:
    """Q10 / A8: entities seen on more than one platform."""
    return (
        mentions.groupBy("cluster_id")
        .agg(F.countDistinct("platform").alias("n_platforms"),
             F.concat_ws(",", F.sort_array(F.collect_set("platform"))).alias("platforms"))
        .where(F.col("n_platforms") > 1)
        .orderBy(F.desc("n_platforms"), F.asc("cluster_id"))
        .limit(k)
    )


def cross_session_overlap(mentions: DataFrame, min_shared: int = 2, k: int = 10) -> DataFrame:
    """Template 11 / A9: conversation pairs sharing > min_shared entities."""
    m = mentions.select("conv_id", "cluster_id").distinct()
    a = m.select(F.col("conv_id").alias("conv_a"), "cluster_id")
    b = m.select(F.col("conv_id").alias("conv_b"), "cluster_id")
    return (
        a.join(b, "cluster_id")
        .where(F.col("conv_a") < F.col("conv_b"))
        .groupBy("conv_a", "conv_b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") > min_shared)
        .orderBy(F.desc("n_shared"), F.asc("conv_a"), F.asc("conv_b"))
        .limit(k)
    )


def tool_usage(turns: DataFrame) -> DataFrame:
    """Q5 / A10: tool-call counts."""
    return (
        turns.where(F.col("tool").isNotNull())
        .groupBy("tool")
        .agg(F.count("*").alias("n_calls"))
        .orderBy(F.desc("n_calls"), F.asc("tool"))
    )


def project_knowledge_map(mentions: DataFrame, turns: DataFrame, k: int = 50) -> DataFrame:
    """Template 13 / A11: per-project entity mention counts. Project is
    derived from source_file path (reference detect_project,
    jsonl_to_rdf.py:33-47)."""
    proj = (
        turns.select("conv_id", F.regexp_extract("source_file", r"/projects/([^/]+)/", 1)
                     .alias("project"))
        .distinct()
    )
    return (
        mentions.join(F.broadcast(proj), "conv_id")
        .groupBy("project", "cluster_id")
        .agg(F.count("*").alias("n_mentions"))
        .orderBy(F.desc("n_mentions"), F.asc("project"), F.asc("cluster_id"))
        .limit(k)
    )


def session_timeline(turns: DataFrame) -> DataFrame:
    """W2: first/last timestamp + turn count per conversation."""
    return (
        turns.groupBy("conv_id")
        .agg(F.min("ts").alias("created"),
             F.max("ts").alias("modified"),
             F.count("*").alias("n_turns"))
        .orderBy("conv_id")
    )


def two_hop_neighbors(mentions: DataFrame, label: str, k: int = 20) -> DataFrame:
    """Template path query: entities co-occurring with entities that
    co-occur with `label` (2-hop over the co-mention graph)."""
    m = mentions.select("conv_id", "cluster_id").distinct()
    hop1 = (
        m.where(F.col("cluster_id") == label)
        .join(m.withColumnRenamed("cluster_id", "mid"), "conv_id")
        .where(F.col("mid") != label)
        .select("mid").distinct()
    )
    # prune FIRST: restrict the left side to rows whose entity is a hop-1
    # neighbor before the co-mention expansion — Catalyst will not reorder
    # this inner join on its own without CBO stats, and the unpruned form
    # is a full O(sum d_c^2) self-join at scale. hop1 is tiny (neighbors of
    # one entity), so both the semi-join and the equi-join broadcast it.
    mid_rows = m.withColumnRenamed("cluster_id", "mid").join(
        F.broadcast(hop1), "mid", "left_semi"
    )
    hop2 = (
        mid_rows.join(m, "conv_id")
        .where((F.col("cluster_id") != label) & (F.col("cluster_id") != F.col("mid")))
        .groupBy("cluster_id")
        .agg(F.countDistinct("mid").alias("n_paths"))
        .orderBy(F.desc("n_paths"), F.asc("cluster_id"))
        .limit(k)
    )
    return hop2
