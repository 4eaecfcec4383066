"""Knowledge-triple construction (SURVEY.md §1.2, §2.3 N3/N6).

The reference's LLM emits (subject, predicate, object) triples per
assistant message, normalized into a closed 24-predicate vocabulary and
stored twice: a direct entity->entity edge for traversal plus a reified
KnowledgeTriple node with provenance (common.py:201-215; design decision
README.md:567). The deterministic analog:

- subject/object: consecutive mention pairs within a turn (the mention
  extractor's occurrence order);
- predicate: cue-word lookup in the turn text between/around the pair,
  coerced into the vocabulary via the same stripped-key broadcast join as
  normalize_predicates, falling back to relatedTo;
- triple id: md5(subject|predicate|object|conv|turn)[:12] — the
  reference's dedup-by-construction id (common.py:206-209);
- dual storage: `edges` (s, p, o) + `reified` (+ triple_id, conv_id,
  turn_idx, ts provenance columns).

Cue detection is a JVM-side regexp over the turn text (no UDF): the cues
are a small closed set derived from the predicate vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from session_graph_spark.functions.normalize import stable_id

# cue word -> vocabulary predicate (a deterministic stand-in for the
# LLM's predicate choice; unknown contexts fall back to relatedTo)
CUE_PREDICATES: dict[str, str] = {
    "uses": "uses", "using": "uses", "depends": "dependsOn",
    "requires": "requires", "needs": "requires", "migrat": "alternativeTo",
    "switch": "alternativeTo", "deploy": "deployedOn", "stores": "storesIn",
    "integrat": "integratesWith", "wire": "integratesWith",
    "configur": "configures", "extends": "extends", "implements": "implements",
    "provides": "provides", "produces": "produces", "solves": "solves",
    "built": "builtWith", "part of": "isPartOf", "talks to": "integratesWith",
}
_CUE_RE = "(" + "|".join(sorted(CUE_PREDICATES, key=len, reverse=True)) + ")"


def build_triples(mentions: DataFrame, turns: DataFrame) -> dict[str, DataFrame]:
    """mentions (conv_id, turn_idx, canon_label, pos, ts[, off]) + turns
    (for the text cue scan) -> {'edges', 'reified'} DataFrames.

    The predicate is chosen PER PAIR by char offset (the reference picks
    a predicate per triple, triple_extraction.py:265-333, normalized at
    :348-374): ALL cue matches in the turn are extracted in order
    (regexp_extract_all) and their char offsets recovered with a
    sequential locate fold (same left-to-right, non-overlapping walk as
    the regex). A pair takes the cue whose offset lies BETWEEN the
    subject and object offsets; if none, the nearest cue to the LEFT of
    the pair; else relatedTo — so 'A and B; C uses D' emits
    relatedTo(A,B) and uses(C,D), where index alignment applied 'uses'
    to both.

    Mention offsets: when the mentions frame carries the extractor's
    `off` column (extract_mentions(..., with_offsets=True) — the
    standard triple path), the TRUE match offsets are used directly —
    this covers alias-normalized mentions (k8s -> kubernetes) whose
    canonical label never occurs in the text, and labels embedded in
    longer words ('java' inside 'javascript'), with no re-scan of the
    text. Without `off` (offset-less callers), offsets are recovered by
    locate() on the canonical label, guarded by token-boundary checks on
    BOTH ends of both occurrences — an occurrence embedded in another
    word is not usable evidence — and any unrecoverable/unusable offset
    drops the pair to order-based alignment (pair i takes cue
    min(i, last)). Everything is JVM-side codegen: locate folds via
    higher-order aggregate, no UDF, no extra shuffle. Turns with no cue
    fall back to relatedTo."""
    has_off = "off" in mentions.columns
    off_cols = ["off"] if has_off else []
    m = mentions.select("conv_id", "turn_idx", "canon_label", "pos", "ts",
                        *off_cols)
    nxt = m.select(
        "conv_id", "turn_idx",
        (F.col("pos") - 1).alias("pos"),
        F.col("canon_label").alias("obj"),
        *([F.col("off").alias("__obj_off")] if has_off else []),
    )
    pairs = (
        m.join(nxt, ["conv_id", "turn_idx", "pos"])
        .where(F.col("canon_label") != F.col("obj"))
        .select("conv_id", "turn_idx", "ts", "pos",
                F.col("canon_label").alias("subject"), F.col("obj").alias("object"),
                *([F.col("off").alias("__s_off"), F.col("__obj_off").alias("__o_off")]
                  if has_off else []))
    )
    cues = turns.select(
        "conv_id", "turn_idx",
        F.lower("text").alias("__lt"),
        F.regexp_extract_all(F.lower("text"), F.lit(_CUE_RE), F.lit(1))
        .alias("cue_list"),
    ).withColumn(
        # offsets of the i-th cue occurrence: fold locate() forward from
        # each previous match end — the same left-to-right non-overlapping
        # scan the extraction regex performed (1-based; 0 never occurs
        # because every cue was extracted from this exact text)
        "cue_offs",
        F.expr(
            "aggregate(cue_list,"
            " named_struct('frm', 1, 'offs', cast(array() as array<int>)),"
            " (acc, c) -> named_struct("
            "   'frm', locate(c, __lt, acc.frm) + length(c),"
            "   'offs', array_append(acc.offs, locate(c, __lt, acc.frm))),"
            " acc -> acc.offs)"
        ),
    )
    cue_map = F.create_map(
        *[F.lit(x) for kv in CUE_PREDICATES.items() for x in kv]
    )
    n_cues = F.size("cue_list")
    joined = pairs.join(cues, ["conv_id", "turn_idx"], "left")
    if has_off:
        # extractor-carried TRUE match offsets (1-based in the lowered
        # truncated text — the same coordinates the cue fold uses for the
        # first EXTRACT_INPUT_MAX_CHARS chars; a cue past the truncation
        # point correctly reads as "after every mention"). Two distinct
        # labels can never share an offset, but the != guard stays as a
        # cheap invariant check; null/0 never occurs by construction.
        usable = (
            (F.col("__s_off") > 0) & (F.col("__o_off") > 0)
            & (F.col("__s_off") != F.col("__o_off"))
        )
    else:
        joined = joined.withColumn("__s_off", F.expr("locate(subject, __lt)"))
        # the object is the NEXT mention in occurrence order, so its
        # relevant occurrence is the first one AFTER the subject's —
        # plain first-occurrence would point a repeated label ('gamma
        # needs alpha' where alpha opened the turn) at the wrong span and
        # steal/lose the cue. Fall back to the global first occurrence
        # when the object only appears before the subject
        o_after = F.expr("locate(object, __lt, __s_off + 1)")
        joined = joined.withColumn(
            "__o_off",
            F.when(o_after > 0, o_after).otherwise(F.expr("locate(object, __lt)")),
        )

        # token-boundary guard (ADVICE r5): a located occurrence EMBEDDED
        # in a longer word ('java' starting inside 'javascript') anchors
        # the pair span at the wrong position and can steal a cue from a
        # neighboring pair — such an occurrence is not usable offset
        # evidence. Boundary classes mirror the extraction regex
        # ((?<![\w.]) before, (?!\w) after, lowercased text). substring()
        # clamps pos 0 to 1, so the before-check gates on off > 1 or a
        # first-char occurrence would read its own first char.
        def _embedded(off: str, label: str):
            before_bad = (F.col(off) > 1) & F.expr(
                f"substring(__lt, {off} - 1, 1)"
            ).rlike("[a-z0-9_.]")
            after_bad = F.expr(
                f"substring(__lt, {off} + length({label}), 1)"
            ).rlike("[a-z0-9_]")
            return before_bad | after_bad

        usable = (
            (F.col("__s_off") > 0) & (F.col("__o_off") > 0)
            # identical offsets mean the two labels' occurrences could
            # not be separated (e.g. one is a leading substring of the
            # other and appears nowhere else) — unusable evidence
            & (F.col("__s_off") != F.col("__o_off"))
            & ~_embedded("__s_off", "subject")
            & ~_embedded("__o_off", "object")
        )
    lo = F.least("__s_off", "__o_off")
    hi = F.greatest("__s_off", "__o_off")
    z = F.arrays_zip("cue_list", "cue_offs")
    between = F.filter(z, lambda x: (x["cue_offs"] > lo) & (x["cue_offs"] < hi))
    leftof = F.filter(z, lambda x: x["cue_offs"] <= lo)
    offset_cue = F.when(
        F.size(between) > 0, F.element_at(between, 1)["cue_list"]
    ).when(
        F.size(leftof) > 0, F.element_at(leftof, -1)["cue_list"]
    )
    order_cue = F.when(
        n_cues > 0,
        F.element_at(
            "cue_list",
            F.least(F.col("pos") + 1, n_cues).cast("int"),
        ),
    )
    pair_cue = F.when(usable, offset_cue).otherwise(order_cue)
    with_pred = (
        joined.withColumn(
            "predicate",
            F.coalesce(cue_map[pair_cue], F.lit("relatedTo")),
        )
        .drop("cue_list", "cue_offs", "__lt", "pos", "__s_off", "__o_off")
    )
    reified = with_pred.withColumn(
        "triple_id",
        stable_id(F.col("subject"), F.col("predicate"), F.col("object"),
                  F.col("conv_id"), F.col("turn_idx")),
    ).dropDuplicates(["triple_id"])
    edges = reified.select("subject", "predicate", "object").dropDuplicates()
    return {"edges": edges, "reified": reified}


def entity_context(mentions: DataFrame, max_terms: int = 5) -> DataFrame:
    """A1: per entity, the top co-occurring labels (sorted, capped at 5 —
    reference link_entities.py:437-493). Used as the disambiguation-
    context analog; exposed as an auxiliary similarity signal.

    Shape: ONE shuffle of mention rows (groupBy turn + collect_set, which
    also dedups within the turn), then a narrow double-explode generates
    the co-occurrence pairs — no self-join, no separate distinct. The
    per-turn set is bounded (mention cap 10), so the explode fan-out is
    <= 90 rows per turn and the (label, ctx) aggregation map-side-combines
    before its exchange. The former distinct + per-turn self-join paid two
    wide scans of the mention table for the same result."""
    per_turn = (
        mentions.select("conv_id", "turn_idx", "canon_label")
        .groupBy("conv_id", "turn_idx")
        .agg(F.collect_set("canon_label").alias("__ls"))
    )
    co = (
        per_turn.select(F.explode("__ls").alias("canon_label"), "__ls")
        .select("canon_label", F.explode("__ls").alias("ctx"))
        .where(F.col("canon_label") != F.col("ctx"))
        .groupBy("canon_label", "ctx")
        .agg(F.count("*").alias("n"))
    )
    return (
        co.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("canon_label").orderBy(F.desc("n"), F.asc("ctx"))
            ),
        )
        .where(F.col("rank") <= max_terms)
        .groupBy("canon_label")
        .agg(F.sort_array(F.collect_set("ctx")).alias("context"))
    )


def hub_by_triple_degree(edges: DataFrame, k: int = 20) -> DataFrame:
    """A5 exact analog: degree over subject ∪ object roles of the triple
    table (the reference's bidirectional UNION, template 10)."""
    subj = edges.select(F.col("subject").alias("label"))
    obj = edges.select(F.col("object").alias("label"))
    return (
        subj.unionByName(obj)
        .groupBy("label").agg(F.count("*").alias("degree"))
        .orderBy(F.desc("degree"), F.asc("label"))
        .limit(k)
    )
