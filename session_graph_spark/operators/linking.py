"""Entity linking against a knowledge-base dimension (the reference's
headline feature, re-expressed without external APIs).

The reference links each resolved entity label to a Wikidata QID with a
confidence ladder (link_entities.py:517-545): exact label match -> 1.0,
tech keyword in the candidate's description -> 0.8, else 0.5; links below
CONFIDENCE_THRESHOLD = 0.7 (link_entities.py:57) are rejected, and every
decision — including "searched, not found" — is cached so re-runs never
re-query (negative caching, link_entities.py:295-311). Output is an
owl:sameAs-style edge table.

Here the Wikidata search is replaced by a deterministic gazetteer
dimension table (kb_id, label, description, aliases): candidate
generation is a broadcast join on exact label OR alias, best-match
selection prefers the exact-label candidate then lowest kb_id, and the
identical ladder/threshold/caching semantics apply. Everything is
DataFrame joins — no UDFs, no driver loops; the KB is a broadcast dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CONFIDENCE_THRESHOLD = 0.7  # reference link_entities.py:57

# reference TECH_KEYWORDS (link_entities.py:64-69): description terms that
# mark a candidate as a technology sense of an ambiguous label
TECH_KEYWORDS: tuple[str, ...] = (
    "software", "database", "framework", "library", "programming",
    "language", "tool", "platform", "application", "system",
    "service", "api", "protocol", "standard", "specification",
    "technology", "infrastructure", "container", "orchestration",
)

# Deterministic gazetteer: (kb_id, label, description, aliases).
# Curated for this engine (kb: ids are synthetic); descriptions decide the
# 0.8 rung exactly like Wikidata descriptions do in the reference.
KB_ENTRIES: tuple[tuple[str, str, str, tuple[str, ...]], ...] = (
    ("kb:0001", "python", "high-level programming language", ("py", "cpython")),
    ("kb:0002", "javascript", "programming language of the web", ("js", "ecmascript")),
    ("kb:0003", "typescript", "typed superset programming language", ("ts",)),
    ("kb:0004", "go", "compiled programming language", ("golang",)),
    ("kb:0005", "rust", "memory-safe systems programming language", ()),
    ("kb:0006", "kubernetes", "container orchestration platform", ("k8s", "kube")),
    ("kb:0007", "docker", "container runtime and packaging tool", ()),
    ("kb:0008", "postgresql", "relational database system", ("postgres", "pg")),
    ("kb:0009", "mysql", "relational database system", ()),
    ("kb:0010", "sqlite", "embedded relational database library", ()),
    ("kb:0011", "mongodb", "document database", ("mongo",)),
    ("kb:0012", "redis", "in-memory key-value database", ()),
    ("kb:0013", "elasticsearch", "distributed search and analytics engine", ("es",)),
    ("kb:0014", "neo4j", "graph database", ()),
    ("kb:0015", "apache spark", "distributed data processing framework", ("spark", "pyspark")),
    ("kb:0016", "apache kafka", "distributed event streaming platform", ("kafka",)),
    ("kb:0017", "apache airflow", "workflow orchestration platform", ("airflow",)),
    ("kb:0018", "apache iceberg", "open table format specification", ("iceberg",)),
    ("kb:0019", "react", "user interface library", ("react.js", "reactjs")),
    ("kb:0020", "node.js", "javascript runtime system", ("node", "nodejs")),
    ("kb:0021", "next.js", "react web framework", ("nextjs",)),
    ("kb:0022", "vue.js", "user interface framework", ("vue", "vuejs")),
    ("kb:0023", "django", "python web framework", ()),
    ("kb:0024", "fastapi", "python web framework", ("fast api",)),
    ("kb:0025", "flask", "python web framework", ()),
    ("kb:0026", "pytorch", "machine learning framework", ("torch",)),
    ("kb:0027", "tensorflow", "machine learning framework", ("tf",)),
    ("kb:0028", "scikit-learn", "machine learning library", ("sklearn",)),
    ("kb:0029", "pandas", "data analysis library", ()),
    ("kb:0030", "numpy", "numerical computing library", ()),
    ("kb:0031", "git", "version control tool", ()),
    ("kb:0032", "github", "code hosting platform", ("gh",)),
    ("kb:0033", "gitlab", "devops platform", ()),
    ("kb:0034", "terraform", "infrastructure as code tool", ()),
    ("kb:0035", "ansible", "configuration management tool", ()),
    ("kb:0036", "prometheus", "monitoring system", ()),
    ("kb:0037", "grafana", "observability dashboard platform", ()),
    ("kb:0038", "opentelemetry", "observability instrumentation standard", ("otel", "otlp")),
    ("kb:0039", "rabbitmq", "message broker service", ("rabbit mq",)),
    ("kb:0040", "nginx", "web server and reverse proxy", ()),
    ("kb:0041", "graphql", "query language and api specification", ()),
    ("kb:0042", "grpc", "remote procedure call protocol", ()),
    ("kb:0043", "amazon web services", "cloud computing platform", ("aws",)),
    ("kb:0044", "google cloud platform", "cloud computing platform", ("gcp",)),
    ("kb:0045", "azure", "cloud computing platform", ()),
    ("kb:0046", "linux", "operating system kernel", ()),
    ("kb:0047", "backend", "server-side part of an application", ()),
    ("kb:0048", "frontend", "client-side part of an application", ()),
    ("kb:0049", "agent", "autonomous acting entity", ()),
    ("kb:0050", "api", "application programming interface", ("apis",)),
    # non-tech sense reachable only via alias: exercises the 0.5 rung
    # (below threshold -> candidate found but NOT linked)
    ("kb:0051", "mercury", "roman deity and first planet", ("hg",)),
)


def kb_df(spark: SparkSession) -> DataFrame:
    """The gazetteer dimension as a DataFrame (broadcast-sized)."""
    return spark.createDataFrame(
        [(k, lbl, d, list(a)) for k, lbl, d, a in KB_ENTRIES],
        "kb_id string, kb_label string, description string, aliases array<string>",
    )


def _tech_keyword_hit(desc_col) -> "F.Column":
    low = F.lower(desc_col)
    hit = F.lit(False)
    for kw in TECH_KEYWORDS:
        hit = hit | low.contains(kw)
    return hit


def link_to_kb(
    labels: DataFrame,
    kb: DataFrame,
    label_col: str = "label",
    threshold: float = CONFIDENCE_THRESHOLD,
    cache: DataFrame | None = None,
) -> DataFrame:
    """Link distinct labels to the KB: (label, kb_id, kb_label,
    description, confidence, linked).

    Ladder (reference link_entities.py:528-536): candidate whose kb_label
    equals the query label -> 1.0; candidate found via alias whose
    description contains a tech keyword -> 0.8; other alias candidates ->
    0.5. Labels with no candidate get (NULL, 0.0, false) — a *recorded*
    negative decision, so the row also lands in the cache (negative
    caching, link_entities.py:308-311). `cache` rows (same schema) are
    reused verbatim and their labels skip the join entirely.
    """
    q = labels.select(F.lower(F.trim(F.col(label_col))).alias("label")).distinct()

    out_cols = ["label", "kb_id", "kb_label", "description", "confidence", "linked"]
    cached = None
    if cache is not None:
        cached = cache.select(*out_cols)
        q = q.join(cached.select("label"), "label", "left_anti")

    # candidate generation: exact label ∪ alias hits (one exploded
    # broadcast dim; `via_alias` marks which channel matched)
    exact_side = kb.select(
        F.col("kb_label").alias("match_key"), "kb_id", "kb_label", "description",
        F.lit(False).alias("via_alias"),
    )
    alias_side = kb.select(
        F.explode("aliases").alias("match_key"), "kb_id", "kb_label", "description",
        F.lit(True).alias("via_alias"),
    )
    dim = F.broadcast(exact_side.unionByName(alias_side))

    cand = q.join(dim, q.label == dim.match_key, "left")
    conf = (
        F.when(F.col("match_key").isNull(), F.lit(0.0))
        .when(~F.col("via_alias"), F.lit(1.0))  # exact label match
        .when(_tech_keyword_hit(F.col("description")), F.lit(0.8))
        .otherwise(F.lit(0.5))
    )
    cand = cand.withColumn("confidence", conf)
    # best match per label: highest confidence, then lowest kb_id
    w = Window.partitionBy("label").orderBy(
        F.desc("confidence"), F.asc_nulls_last("kb_id")
    )
    best = (
        cand.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(
            "label",
            F.when(F.col("confidence") >= threshold, F.col("kb_id")).alias("kb_id"),
            F.when(F.col("confidence") >= threshold, F.col("kb_label")).alias("kb_label"),
            F.when(F.col("confidence") >= threshold, F.col("description")).alias("description"),
            "confidence",
            (F.col("confidence") >= threshold).alias("linked"),
        )
    )
    if cached is not None:
        best = best.unionByName(cached)
    return best


def link_clusters(clusters: DataFrame, kb: DataFrame | None = None,
                  cache: DataFrame | None = None,
                  threshold: float = CONFIDENCE_THRESHOLD) -> DataFrame:
    """Post-clustering link step (the reference pipeline order:
    link_entities runs over the resolved entity list, link_entities.py
    main flow): one row per cluster canonical label with its KB decision.

    `clusters` is ResolutionResult.clusters (label, cluster_id); the
    canonical label of a cluster is its cluster_id (min-label canonical),
    so linking runs once per CLUSTER, not once per surface form — at
    100TB the link join sees only distinct canonical labels."""
    spark = clusters.sparkSession
    kb = kb if kb is not None else kb_df(spark)
    canon = clusters.select(F.col("cluster_id").alias("label")).distinct()
    linked = link_to_kb(canon, kb, label_col="label", threshold=threshold,
                        cache=cache)
    return linked.withColumnRenamed("label", "cluster_id")


def same_as_edges(linked: DataFrame) -> DataFrame:
    """owl:sameAs-style output (label, same_as) for linked labels only
    (reference writes devkg entity owl:sameAs wd:QID)."""
    return (
        linked.where(F.col("linked"))
        .select("label", F.col("kb_id").alias("same_as"))
    )
