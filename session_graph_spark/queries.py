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
    """W2: first/last timestamp + turn count per conversation, plus the
    session title — the first user turn's text, truncated (reference
    session-node metadata: warp_to_rdf.py:136-146 first-query preview,
    jsonl_to_rdf.py:84-99 title+project)."""
    title = (
        turns.where(F.col("role") == "user")
        .groupBy("conv_id")
        .agg(F.expr("min_by(substring(text, 1, 80), turn_idx)").alias("title"))
    )
    return (
        turns.groupBy("conv_id")
        .agg(F.min("ts").alias("created"),
             F.max("ts").alias("modified"),
             F.count("*").alias("n_turns"))
        .join(title, "conv_id", "left")
        .orderBy("conv_id")
    )


def models_seen(turns: DataFrame) -> DataFrame:
    """Model/agent provenance rollup (reference jsonl_to_rdf.py:158-162
    tracks models_seen per session; common.py:96-113 creates Developer /
    AIModel prov:Agent nodes): per conversation, the sorted distinct model
    ids, the first model by turn order, and the model count. Rows without
    provenance (user turns, platforms whose exports carry no model id)
    are excluded before the rollup."""
    m = turns.where(F.col("model").isNotNull())
    return (
        m.groupBy("conv_id")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("model"))).alias("models_seen"),
            F.expr("min_by(model, turn_idx)").alias("first_model"),
            F.countDistinct("model").alias("n_models"),
        )
        .orderBy("conv_id")
    )


def topic_search(mentions: DataFrame, turns: DataFrame, topic: str) -> DataFrame:
    """Template 5 — "What sessions discussed X?": conversations whose
    entity labels contain the topic substring, with session metadata
    (reference SKILL.md:218-236). The label filter runs on the small
    distinct (conv, label) side; session bounds join after. Metadata picks
    the FIRST turn's values by (ts, turn_idx) — min_by, not first(), so a
    conversation spanning source files returns deterministic metadata."""
    convs = (
        mentions.where(F.col("canon_label").contains(topic))
        .select("conv_id").distinct()
    )
    meta = turns.groupBy("conv_id").agg(
        F.expr("min_by(platform, struct(ts, turn_idx))").alias("platform"),
        F.min("ts").alias("created"),
        F.expr("min_by(source_file, struct(ts, turn_idx))").alias("source_file"),
    )
    return (
        convs.join(meta, "conv_id")
        .select("conv_id", "platform", "created", "source_file")
        .orderBy("created", "conv_id")
    )


def predicate_search(edges: DataFrame, predicate: str, entity_substr: str) -> DataFrame:
    """Template 3 — "What uses/enables/solves X?": distinct (subject,
    object) pairs of one predicate where either end contains the entity
    (reference SKILL.md:189-204). The predicate filter prunes before the
    contains scan; both push into the edge-table scan."""
    return (
        edges.where(
            (F.col("predicate") == predicate)
            & (F.col("subject").contains(entity_substr)
               | F.col("object").contains(entity_substr))
        )
        .select("subject", "object").distinct()
        .orderBy("subject", "object")
    )


def entity_to_entity(edges: DataFrame, x: str, y: str) -> DataFrame:
    """Template 2 — "How does X relate to Y?": distinct predicates on
    edges whose subject contains x and object contains y
    (reference SKILL.md:170-187)."""
    return (
        edges.where(F.col("subject").contains(x) & F.col("object").contains(y))
        .select("predicate").distinct()
        .orderBy("predicate")
    )


def path_discovery(edges: DataFrame, x: str, y: str) -> DataFrame:
    """Template 12 — "How does X connect to Y?": 2-hop paths in the three
    direction shapes of the reference union (a->mid->b, mid->a & mid->b,
    a->mid & b->mid; SKILL.md:359-403), returned as distinct
    (p1, mid, p2). Each union arm filters to the two endpoint entities
    FIRST, so the join is tiny-side x tiny-side — never the full edge
    self-join."""
    e = edges.select("subject", "predicate", "object")

    def ends_x(col):  # entity filter, reference CONTAINS(LCASE(label))
        return F.col(col).contains(x)

    def ends_y(col):
        return F.col(col).contains(y)

    fwd_x = e.where(ends_x("subject")).select(
        F.col("predicate").alias("p1"), F.col("object").alias("mid"),
        F.col("subject").alias("a"))
    rev_x = e.where(ends_x("object")).select(
        F.col("predicate").alias("p1"), F.col("subject").alias("mid"),
        F.col("object").alias("a"))
    fwd_y = e.where(ends_y("object")).select(
        F.col("predicate").alias("p2"), F.col("subject").alias("mid2"),
        F.col("object").alias("b"))
    rev_y = e.where(ends_y("subject")).select(
        F.col("predicate").alias("p2"), F.col("object").alias("mid2"),
        F.col("subject").alias("b"))

    # arm 1: a -> mid -> b ; arm 2: mid -> a, mid -> b ; arm 3: a -> mid <- b
    arm1 = fwd_x.join(fwd_y, fwd_x.mid == fwd_y.mid2)
    arm2 = rev_x.join(fwd_y, rev_x.mid == fwd_y.mid2)
    arm3 = fwd_x.join(rev_y, fwd_x.mid == rev_y.mid2)
    out = None
    for arm in (arm1, arm2, arm3):
        part = arm.where(
            (F.col("a") != F.col("b")) & (F.col("a") != F.col("mid"))
            & (F.col("mid") != F.col("b"))
        ).select("p1", "mid", "p2")
        out = part if out is None else out.unionByName(part)
    return out.distinct().orderBy("p1", "mid", "p2")


def sibling_entities(edges: DataFrame, x: str) -> DataFrame:
    """Template 14 — "What else uses the same thing as X?": entities that
    share a (predicate, object) neighbor with x (reference
    SKILL.md:426-451). x's own edges are filtered before the join, so
    the expansion is shared-neighbor-sized, not edge-table-sized."""
    xe = (
        edges.where(F.col("subject").contains(x))
        .select("predicate", F.col("object").alias("shared"),
                F.col("subject").alias("x_subj"))
        .distinct()
    )
    sib = edges.select(
        F.col("subject").alias("sibling"), "predicate",
        F.col("object").alias("shared"),
    ).distinct()
    return (
        sib.join(xe, ["predicate", "shared"])
        .where(F.col("sibling") != F.col("x_subj"))
        .select("sibling", "predicate", "shared").distinct()
        .orderBy("predicate", "shared", "sibling")
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
