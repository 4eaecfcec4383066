"""End-to-end entity-resolution pipeline (SURVEY.md §3.2 Spark lifecycle).

turns -> mentions -> normalized labels -> blocking -> pairwise scoring ->
connected components -> canonical clusters, with optional per-stage
checkpointing and a decision cache for resume.

Stage boundaries follow the reference's link_entities entry point:
  P9 subagent filter, P3 min-length, P4 assistant-only
  F1 deterministic extraction (+ L1 validity inside)
  N2/N4 normalization + alias broadcast join
  P6 L2 linkability filter
  P7 min-sessions frequency filter (countDistinct conv_id >= 2)
  M2 blocking (exact slug key + MinHash-LSH)
  M3 scoring (Arrow-batched JW/Lev/trigram kernel, threshold 0.7)
  M4 large-star/small-star connected components
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from session_graph_spark.data import alias_rows
from session_graph_spark.functions import filters as Flt
from session_graph_spark.functions.filters import is_linkable_entity
from session_graph_spark.functions.normalize import apply_aliases, slug
from session_graph_spark.functions.similarity import MATCH_THRESHOLD
from session_graph_spark.operators.blocking import block_metrics, candidate_pairs
from session_graph_spark.operators.cc import assign_clusters
from session_graph_spark.operators.extract import (explode_mention_arrays,
                                                   extract_mention_arrays,
                                                   extract_mentions)
from session_graph_spark.operators.scoring import match_edges, score_distribution, score_pairs
from session_graph_spark.plans.checkpoint import StageStore, filter_unprocessed

MIN_SESSIONS = 2  # reference --min-sessions default (link_entities.py:824-828)

# NOTE: the round-5 CTX_SAMPLE_SALTS salted two-phase top-K was removed
# in round 6 — Spark's rank-limit pushdown (WindowGroupLimit) already
# bounds the per-task work of the context-sample window map-side, and
# the salt actively defeated it (see _mention_context).


@dataclass
class ResolutionResult:
    mentions: DataFrame
    labels: DataFrame          # distinct (canon_label, block_key, n_sessions)
    pairs_scored: DataFrame    # (label_a, label_b, score)
    edges: DataFrame           # matches >= threshold
    clusters: DataFrame        # (label, cluster_id)
    mention_clusters: DataFrame  # mentions + cluster_id
    metrics: dict = field(default_factory=dict)
    # internal cache handles the fast path holds beyond the named stages
    # (r7: the per-turn mention-array cache that `mentions` is a lazy
    # explode of) — released by unpersist() alongside the named stages
    extra_caches: list = field(default_factory=list, repr=False)

    def unpersist(self, blocking: bool = False) -> None:
        """Release the fast path's cached stages. A long-lived service
        that calls resolve() per batch (IncrementalRunner) would
        otherwise accumulate one set of cached mentions/labels/scores
        per batch in the executor block manager — call this once every
        consumer has severed lineage (collect/localCheckpoint/write)."""
        for df in (self.mentions, self.labels, self.pairs_scored,
                   self.clusters, *self.extra_caches):
            try:
                df.unpersist(blocking)
            except Exception:  # noqa: BLE001 - checkpointed stages aren't cached
                pass


def alias_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(alias_rows(), ["surface", "canonical"])


def prepare_turns(turns: DataFrame) -> DataFrame:
    """P9 subagent filter (narrow — no shuffle here; the U2 dedup happens
    inside mentions_from_turns AFTER the row filters so the shuffle moves
    only assistant turns' projected columns, not every raw row)."""
    t = turns
    if "source_file" in t.columns:
        t = t.where(Flt.not_subagent())
    return t


def mentions_from_turns(turns: DataFrame, dedup_turns: bool = False,
                        with_offsets: bool = False) -> DataFrame:
    """M1: extraction input filters + deterministic extraction.

    with_offsets=True carries each mention's char offset (triple
    construction path; the ER pipeline itself never reads offsets and
    keeps the narrower mention shuffle).

    dedup_turns=True adds a defensive dropDuplicates on (conv_id,
    turn_idx) for at-least-once sources. It is OFF by default: turn
    identity is the ingest layer's contract — the readers emit unique
    (conv_id, turn_idx) by construction and the watermark path (P12/ST3)
    dedups re-delivered conversations — and the reference likewise
    enforces set semantics at the graph (triple ids), not by rescanning
    messages. The dedup is a full shuffle of the text column, the single
    largest byte-shuffle in the pipeline at 10^7+ turns, so paying it to
    re-assert a guarantee the source already gives is anti-scale. When
    enabled, filters (P3/P4) and the five-column projection still come
    first so the shuffle moves only assistant turns' projected columns."""
    base = turns.where(Flt.assistant_only() & Flt.min_length_filter())
    if "platform" not in base.columns:
        base = base.withColumn("platform", F.lit("unknown"))
    base = base.select("conv_id", "turn_idx", "platform", "ts", "text")
    if dedup_turns:
        base = base.dropDuplicates(["conv_id", "turn_idx"])
    return extract_mentions(base, with_offsets=with_offsets)


def mention_arrays_from_turns(turns: DataFrame,
                              dedup_turns: bool = False) -> DataFrame:
    """Same input filters as mentions_from_turns, but stopping at the
    per-turn mention-label ARRAY (extract.extract_mention_arrays) — the
    form resolve()'s fast path caches (r7): one row per turn instead of
    one per mention, no per-mention conv_id/mention_id duplication in
    the cache bytes. `explode_mention_arrays` on this output is
    expression-identical to mentions_from_turns."""
    base = turns.where(Flt.assistant_only() & Flt.min_length_filter())
    if "platform" not in base.columns:
        base = base.withColumn("platform", F.lit("unknown"))
    base = base.select("conv_id", "turn_idx", "platform", "ts", "text")
    if dedup_turns:
        base = base.dropDuplicates(["conv_id", "turn_idx"])
    return extract_mention_arrays(base)


def normalized_labels(
    mentions: DataFrame, aliases: DataFrame, min_sessions: int = MIN_SESSIONS
) -> DataFrame:
    """N4 alias join + P6 linkability + P7 frequency filter; output one row
    per surviving distinct label with its block key and session count.

    Curated alias canonicals bypass L2 (whitelist semantics): a canonical
    like 'node.js' would otherwise hit the file-extension rule even though
    it is a known-good dictionary entry."""
    # Alias-join FIRST (broadcast, map-side, shuffle-free), then ONE
    # distinct aggregate. A distinct *before* the join (the round-1 shape)
    # spent a full extra shuffle of mention-level rows to shrink the input
    # of a join that never shuffles anyway. Round 6 folded the remaining
    # dropDuplicates + groupBy-count (two sequential shuffle rounds over
    # mention-level rows) into a single countDistinct aggregate: Catalyst
    # plans it as partial-dedup map-side -> one exchange keyed on the
    # label -> final exact distinct count — same semantics (the DuckDB
    # oracle's count(distinct conv_id) is untouched), one less shuffle
    # barrier, measured 9.25s -> 7.03s on the 11.2M-mention bench corpus
    # at local[4]. The L2 UDF still runs on distinct labels (hundreds).
    pairs = apply_aliases(mentions.select("conv_id", "norm_label"), aliases,
                          label_col="norm_label", out_col="canon_label")
    counts = (
        pairs.groupBy("canon_label")
        .agg(F.countDistinct("conv_id").alias("n_sessions"))
        .where(F.col("n_sessions") >= min_sessions)
    )
    return _labels_tail(counts, aliases)


def _labels_tail(counts: DataFrame, aliases: DataFrame) -> DataFrame:
    """Shared post-count tail: canonical whitelist + L2 linkability +
    block key. The whitelist is a broadcast semi-join flag, not a
    driver-side collect, so it stays a dim-table concern at any
    alias-dictionary size."""
    canon_dim = F.broadcast(
        aliases.select(F.col("canonical").alias("canon_label")).distinct()
        .withColumn("__is_canon", F.lit(True))
    )
    counts = (
        counts.join(canon_dim, "canon_label", "left")
        .where(is_linkable_entity(F.col("canon_label"))
               | F.col("__is_canon").isNotNull())
        .drop("__is_canon")
    )
    return counts.withColumn("block_key", slug("canon_label"))


# above this alias-dimension size the labels array path falls back to
# the classic join form: the in-array lookup is a literal map expression
# whose planning cost grows with the dictionary, while the dictionary is
# driver-sized by design (N4)
_ALIAS_MAP_LITERAL_MAX = 10_000


def normalized_labels_from_arrays(
    m_arrays: DataFrame, aliases: DataFrame, min_sessions: int = MIN_SESSIONS
) -> DataFrame:
    """normalized_labels computed from the per-turn mention-label ARRAYS
    (the fast path's cached form) — value-identical to
    `normalized_labels(explode_mention_arrays(m_arrays), aliases)`
    (pinned by tests/test_r7_pipeline_equiv.py), restructured for scale:

    - aggregate the arrays by conv_id FIRST (collect_list of per-turn
      arrays: one append per turn row, ~10x fewer partial-aggregate
      inputs than mention rows, and partial lists merge correctly across
      partition boundaries — no layout assumption);
    - per conv, flatten + in-array dedup + in-array alias lookup +
      re-dedup: each conv contributes each CANONICAL label at most once;
    - therefore count(*) per label == countDistinct(conv_id), turning
      the exact two-phase distinct aggregate (an exchange keyed
      (canon_label, conv_id) over every distinct pair) into a plain
      count whose partial aggregate is label-cardinality-sized.

    The former shape ran every mention row (112M at sf1.0) through the
    alias broadcast probe and a (canon, conv)-keyed hash dedup — the r7
    probe priced that stage at 21.0s vs 13.0s for this form
    (scripts/r7_labels_variants.py, interleaved best-of-3, identical
    output fingerprints). The alias lookup happens on per-conv DISTINCT
    labels via a literal-map expression; the dictionary is collected
    once (driver-sized dim by design, same as _mention_context's use)
    and oversized dictionaries fall back to the classic join form.

    r7 pass 3: the map probe is guarded by `x.isin(<surfaces>)` — Spark's
    ElementAt on a map literal does a LINEAR key walk (188 comparisons
    per miss at the current dictionary), while the optimizer compiles
    the isin guard to an InSet hash probe, so misses (the overwhelming
    majority of labels) cost O(1) and only true alias hits pay the walk.
    Decision-identical: isin(surfaces) is exactly the condition under
    which element_at is non-null. Measured 17.7s -> 7.8s for the whole
    labels stage at sf1.0/local[32] (scripts/r7_labels_variants3.py,
    interleaved best-of-3, fingerprints equal)."""
    alias_pairs = [
        (r["surface"], r["canonical"])
        for r in aliases.select("surface", "canonical").collect()
    ]
    if len(alias_pairs) > _ALIAS_MAP_LITERAL_MAX:
        return normalized_labels(explode_mention_arrays(m_arrays), aliases,
                                 min_sessions)
    per_conv = m_arrays.groupBy("conv_id").agg(
        F.flatten(F.collect_list("norm_labels")).alias("ls"))
    if alias_pairs:
        amap = F.create_map(*[F.lit(x) for pair in alias_pairs for x in pair])
        akeys = [s for s, _ in alias_pairs]
        canon_set = F.array_distinct(F.transform(
            F.array_distinct("ls"),
            lambda x: F.when(x.isin(akeys),
                             F.coalesce(F.element_at(amap, x), x))
                       .otherwise(x)))
    else:  # empty dictionary: canonical == raw
        canon_set = F.array_distinct(F.col("ls"))
    counts = (
        per_conv.select(F.explode(canon_set).alias("canon_label"))
        .groupBy("canon_label").agg(F.count("*").alias("n_sessions"))
        .where(F.col("n_sessions") >= min_sessions)
    )
    return _labels_tail(counts, aliases)


def _mention_context(mentions: DataFrame, aliases: DataFrame,
                     labels: DataFrame, wanted: DataFrame,
                     cache: bool = True) -> DataFrame | None:
    """Per-canonical-label top-5 co-mention context vectors for the
    scoring bonus, or None when the band is empty (nothing the bonus can
    flip). Three scale bounds keep this stage O(band x evidence), never
    O(corpus):

    - COVERAGE: vectors are built only for `wanted` (the borderline band
      labels, scoring.band_labels) — the only labels whose vector the
      gated bonus can consult;
    - EVIDENCE: each label's vector aggregates a deterministic
      hash-spread sample of CTX_EVIDENCE_TURNS of its turns (ordered by
      md5(conv|turn) — see similarity.CTX_EVIDENCE_TURNS for why NOT
      first-K) — band labels are often hot tokens ('not', 'apache
      spark') whose full turn set is a large fraction of the corpus,
      while a spread sample estimates their top-5 without corpus-sized
      aggregation;
    - CONTENT: co-occurrence counts only labels from the SURVIVING set
      (min-sessions filter) — one-off labels are noise as context.

    The derivation makes two narrow passes over the cached mention
    table (pick the sample turns; gather co-mentions on them); every
    wide operation runs on band-sized data. Both passes filter on the
    RAW norm_label / turn key FIRST and only then canonicalize: the
    band filter is on apply_aliases' *output* (a coalesce over the
    broadcast-join result), which Catalyst cannot push below the join,
    so the r5 shape ran every corpus mention row through 2-3 broadcast
    probes before discarding it — measured corpus-scan-bound under load
    (scripts/ctx_stage_r6*.jsonl: 4x more band rows moved the 1-core
    stage only 14.3s -> 16.6s). The alias dimension is driver-sized by
    design (N4), so the band's surface-form preimage is computed up
    front and pushed down as the scan filter; aliasing then runs on
    band-sized data. Bit-identical to the r5 plan: filtering the
    preimage then canonicalizing == canonicalizing then filtering, and
    the surviving-set semi-join was a no-op on the sample pass because
    band labels come from candidate_pairs(labels). Cached (not
    force-materialized): the two broadcast builds in
    apply_context_bonus are the only consumers, and the first populates
    the cache for the second."""
    from pyspark.sql import Window

    from session_graph_spark.functions.similarity import CTX_EVIDENCE_TURNS

    # the band label set is tiny by construction (labels of pairs whose
    # kernel score fell in an 0.08-wide band); collecting it lets the
    # mention filter be a literal isin and the empty band skip every
    # scan. The guard keeps the driver safe if a pathological corpus
    # floods the band — past it, a broadcast semi-join carries the volume
    wanted_rows = wanted.limit(10_001).collect()
    if not wanted_rows:
        return None
    alias_pairs = [
        (r["surface"], r["canonical"])
        for r in aliases.select("surface", "canonical").collect()
    ]
    raw_m = mentions.select("conv_id", "turn_idx", "norm_label")
    if len(wanted_rows) <= 10_000:
        # preimage of the band under apply_aliases: every surface that
        # canonicalizes INTO the band, plus band labels that are not
        # themselves remapped surfaces (a surface that aliases away can
        # never canonicalize to itself)
        wanted_set = {r[0] for r in wanted_rows}
        alias_keys = {s for s, _ in alias_pairs}
        surfaces = sorted(
            {s for s, c in alias_pairs if c in wanted_set}
            | (wanted_set - alias_keys)
        )
        band_raw = raw_m.where(F.col("norm_label").isin(surfaces))
    else:
        # same preimage, derived distributed when the band floods
        surf_df = (
            aliases.select(F.col("surface").alias("norm_label"),
                           F.col("canonical").alias("canon_label"))
            .join(F.broadcast(wanted), "canon_label", "left_semi")
            .select("norm_label")
            .unionByName(
                wanted.select(F.col("canon_label").alias("norm_label"))
                .join(F.broadcast(aliases.select(
                    F.col("surface").alias("norm_label"))),
                    "norm_label", "left_anti")
            )
        )
        band_raw = raw_m.join(F.broadcast(surf_df), "norm_label", "left_semi")
    band_m = apply_aliases(band_raw, aliases, label_col="norm_label",
                           out_col="canon_label")
    # hash-spread order: an unbiased deterministic sample of the label's
    # turns (md5 is identical in Spark and DuckDB, so the oracle mirrors
    # the exact sample); conv/turn tiebreak for md5-collision paranoia.
    # Top-K rides Spark's rank-limit pushdown (WindowGroupLimit, Spark
    # 3.5+): a `dense_rank() <= K` filter plans a PARTIAL group-limit on
    # the map side, so each scan partition keeps only its first K
    # distinct turns per label (heap scan, no shuffle of the label's
    # full turn set) and the per-label exchange carries <= K rows per
    # label per map partition — a hot label's billions of rows never
    # reach one task. dense_rank (not row_number) because the input is
    # NOT pre-deduped: the order key (md5, conv, turn) is a pure
    # function of (conv, turn), so ties are exactly duplicate turn rows
    # (two surfaces canonicalizing to one label) and rank <= K selects
    # precisely the first K distinct turns; the residual dup rows are
    # dropped on the tiny post-limit frame. Deduping this way (instead
    # of the round-5 distinct() + salted two-phase row_number) matters
    # twice at scale: the distinct was a full band-sized shuffle whose
    # output AQE legitimately coalesces to few partitions when the
    # band's shuffle BYTES are small — which then serialized the
    # downstream sort + partial group-limit into those few tasks (the
    # round-6 counted pool read ctx_build 0.346 at 1v4,
    # scripts/ctx_stage_r6_counted.jsonl) — and the 64-way salt
    # multiplied the partial limit's groups 64x, so at <= 64*K rows
    # kept per partition the map-side reduction never reduced anything.
    # Dropping both runs the group-limit directly on the cached
    # mention-scan partitioning.
    sample_key = F.md5(
        F.concat_ws("|", F.col("conv_id"), F.col("turn_idx").cast("string"))
    )
    w2 = Window.partitionBy("canon_label").orderBy(
        sample_key, "conv_id", "turn_idx"
    )
    # residual dup rows (same turn, two surfaces) are NOT dropped here:
    # the gather pass's count_distinct collapses the duplicate join
    # matches they produce, so a dropDuplicates would spend an extra
    # exchange + stage inside the broadcast build to remove rows the
    # aggregate already ignores
    sampled = (
        band_m.select("canon_label", "conv_id", "turn_idx")
        .withColumn("__rk", F.dense_rank().over(w2))
        .where(F.col("__rk") <= CTX_EVIDENCE_TURNS)
        .select(F.col("canon_label").alias("__band"), "conv_id", "turn_idx")
    )
    # gather pass: probe the corpus scan against the broadcast sample
    # keys FIRST (one hash probe per mention row), then canonicalize and
    # apply the CONTENT bound (surviving labels only) on the sampled
    # turns' rows — band-sized, not corpus-sized
    co = (
        apply_aliases(
            raw_m.join(F.broadcast(sampled), ["conv_id", "turn_idx"]),
            aliases, label_col="norm_label", out_col="canon_label")
        # labels is one row per canon_label by construction
        # (normalized_labels groupBy) — no distinct shuffle in this
        # broadcast build
        .join(F.broadcast(labels.select("canon_label")),
              "canon_label", "left_semi")
        .where(F.col("canon_label") != F.col("__band"))
        # both inputs can carry dups (two surfaces -> one canonical);
        # co-occurrence counts distinct turns — count_distinct's partial
        # aggregation dedups map-side in the SAME shuffle as the count
        # (the former dropDuplicates + count was a second full shuffle
        # and an extra codegen stage of per-job latency)
        .select("__band", "conv_id", "turn_idx",
                F.col("canon_label").alias("ctx"))
        .groupBy("__band", "ctx")
        .agg(F.count_distinct("conv_id", "turn_idx").alias("n"))
    )
    # top-5 by (n desc, ctx asc) fused into the per-band aggregate:
    # array_sort on (-n, ctx) structs == the former rank window's order,
    # so slice(.., 1, 5) selects the identical five and sort_array
    # yields the identical context vector — one aggregate stage instead
    # of window + filter + aggregate (each a codegen stage of fixed
    # latency on a frame that is band-sized anyway)
    out = (
        co.groupBy("__band")
        .agg(F.sort_array(F.transform(
            F.slice(F.array_sort(F.collect_list(
                F.struct((-F.col("n")).alias("a"), F.col("ctx").alias("b")))),
                1, 5),
            lambda x: x["b"])).alias("context"))
        .withColumnRenamed("__band", "canon_label")
    )
    # cache=False exists for the plan audit only (scripts/explain_plans.py
    # asserts the WindowGroupLimit pushdown on the UNCACHED plan — the
    # InMemoryRelation node hides its child subtree in formatted explain)
    return out.cache() if cache else out


def resolve(
    spark: SparkSession,
    turns: DataFrame,
    aliases: DataFrame | None = None,
    min_sessions: int = MIN_SESSIONS,
    threshold: float = MATCH_THRESHOLD,
    checkpoint_dir: str | None = None,
    decisions: DataFrame | None = None,
    processed_watermarks: DataFrame | None = None,
    collect_metrics: bool = False,
    max_parallelism: int | None = None,
    use_context: bool = True,
) -> ResolutionResult:
    """Run the full ER pipeline. All heavy lifting is DataFrame ops; Python
    only runs inside Arrow-batched UDFs (extraction, L2 filter, scoring).

    max_parallelism: optional cap on concurrent extraction tasks (a
    shuffle-free coalesce of the turns input). The regex/extraction stage
    is memory-bandwidth-bound, not ALU-bound — on this host class
    per-task throughput degrades ~6x at 16 concurrent tasks and ~23x at
    32 (BENCH.md microbench) — so above the knee, fewer fatter tasks run
    faster. Scoped HERE rather than a session-wide spark.task.cpus so
    sub-second shuffle queries on the same session keep full parallelism
    (the round-2 global knob cost them ~2x).

    use_context (default True): blend the surrounding-turn-context signal
    into pair scores per the north star ("mention strings AND surrounding
    turn context") — for kernel scores in [threshold - CTX_WEIGHT,
    threshold), score = min(kernel + CTX_WEIGHT * jaccard(top-5
    co-mention context vectors), 1.0); other scores stay the pure kernel.
    The band gate is exact, not approximate: an additive bonus of at most
    CTX_WEIGHT cannot flip any decision outside that band, so the
    expensive context aggregation runs only over turns containing a
    borderline label (scoring.band_labels + _mention_context) instead of
    the whole corpus. Disabling can only remove edges, never add."""
    aliases = aliases if aliases is not None else alias_df(spark)

    turns = prepare_turns(turns)
    turns = filter_unprocessed(turns, processed_watermarks)
    if max_parallelism:
        turns = turns.coalesce(max_parallelism)

    extra_caches: list[DataFrame] = []
    if checkpoint_dir is None:
        # fast path: no parquet checkpoints, but each multi-consumer
        # DataFrame is cached AND materialized before the plans that scan
        # it twice (blocking/LSH self-joins) — an unmaterialized cache
        # would be recomputed once per join branch inside the first action
        store = StageStore(spark, None)
        ctx_holder: list[DataFrame] = []
        own_caches: list[DataFrame] = []
        try:
            # r7: cache the PRE-EXPLODE per-turn arrays (~10x fewer rows,
            # no per-mention conv_id/mention_id duplication) and expose
            # `mentions` as a lazy explode of the cache — the r7 probe
            # (scripts/r7_extract_probe.py) priced cache POPULATION at
            # ~19s of the 57.9s mentions stage at sf1.0/local[32] while
            # cache READS are sub-second, so shrinking the written form
            # is the lever; every consumer (labels, ctx, mention_clusters)
            # scans the array cache and explodes in-stage
            m_arrays = mention_arrays_from_turns(turns).cache()
            own_caches.append(m_arrays)
            extra_caches.append(m_arrays)
            mentions = explode_mention_arrays(m_arrays)
            # materialize the cache + record the mention row count in ONE
            # action WITHOUT generating the exploded rows: the mention
            # count is the sum of per-turn array sizes by construction
            n_mentions = m_arrays.agg(
                F.sum(F.size("norm_labels"))).collect()[0][0]
            store.manifest["mentions"] = {"rows": int(n_mentions or 0)}
            labels = normalized_labels_from_arrays(
                m_arrays, aliases, min_sessions).cache()
            own_caches.append(labels)
            store.manifest["labels"] = {"rows": labels.count()}
            pairs = candidate_pairs(labels, label_col="canon_label",
                                    block_col="block_key")

            def _ctx_builder(scored_fresh: DataFrame) -> DataFrame | None:
                from session_graph_spark.operators.scoring import band_labels

                ctx = _mention_context(mentions, aliases, labels,
                                       band_labels(scored_fresh))
                if ctx is not None:
                    ctx_holder.append(ctx)
                return ctx

            scored = score_pairs(
                pairs, decisions=decisions,
                context_builder=_ctx_builder if use_context else None,
            ).cache()
            own_caches.append(scored)
            store.manifest["scored"] = {"rows": scored.count()}
        except Exception:
            # a failure mid-build (poison data in extraction, scoring ...)
            # must not leak the caches materialized before it — the
            # quarantine path's bisection probes hit this repeatedly and
            # would otherwise accumulate orphaned cached stages exactly
            # when memory is already tight
            for df in own_caches + ctx_holder:
                try:
                    df.unpersist()
                except Exception:  # noqa: BLE001
                    pass
            raise
        for c in ctx_holder:
            c.unpersist()  # scored is materialized; the ctx cache is dead
        edges = match_edges(scored, threshold)
        clusters = assign_clusters(labels, edges, label_col="canon_label").cache()
    else:
        store = StageStore(spark, checkpoint_dir)
        turns_fp = store.fingerprint(turns.select("conv_id", "turn_idx", "text"))
        # stage keys fold in EVERY input that shapes the stage's output —
        # data fingerprints AND config — so re-running with a different
        # alias table, min_sessions, decision cache, or threshold never
        # returns a stale checkpoint
        alias_fp = store.fingerprint(aliases)
        mentions = store.stage("mentions", turns_fp, lambda: mentions_from_turns(turns))
        labels = store.stage(
            "labels", f"{turns_fp}:{alias_fp}:ms={min_sessions}",
            lambda: normalized_labels(mentions, aliases, min_sessions),
        )
        labels_fp = store.fingerprint(labels)
        decisions_fp = store.fingerprint(decisions) if decisions is not None else "none"
        pairs = store.stage(
            "pairs", labels_fp,
            lambda: candidate_pairs(labels, label_col="canon_label", block_col="block_key"),
        )
        # ctx derives from mentions+aliases but is NOT a function of the
        # labels table alone (co-occurrence can change while the distinct
        # label set stays fixed), so the ctx part of the stage key is the
        # turns+alias fingerprint, not labels_fp. Built lazily INSIDE the
        # stage lambda: a reused checkpoint must not pay the context
        # self-join
        ctx_key = f"{turns_fp}:{alias_fp}" if use_context else "off"
        ctx_holder: list[DataFrame] = []

        def _ctx_builder(scored_fresh: DataFrame) -> DataFrame | None:
            from session_graph_spark.operators.scoring import band_labels

            ctx = _mention_context(mentions, aliases, labels,
                                   band_labels(scored_fresh))
            if ctx is not None:
                ctx_holder.append(ctx)
            return ctx

        try:
            scored = store.stage(
                "scored", f"{labels_fp}:dec={decisions_fp}:ctx={ctx_key}",
                lambda: score_pairs(
                    pairs, decisions=decisions,
                    context_builder=_ctx_builder if use_context else None,
                ),
            )
        except Exception:
            # mirror the fast path's cleanup: a stage failure after
            # _ctx_builder cached the context frame must not leak one
            # cached DataFrame per attempt on the quarantine bisection path
            for c in ctx_holder:
                try:
                    c.unpersist()
                except Exception:  # noqa: BLE001
                    pass
            raise
        for c in ctx_holder:
            c.unpersist()  # scored stage is parquet-materialized
        edges = match_edges(scored, threshold)
        clusters = store.stage(
            "clusters", f"{labels_fp}:dec={decisions_fp}:ctx={ctx_key}:th={threshold}",
            lambda: assign_clusters(labels, edges, label_col="canon_label"),
        )

    # r7: ONE broadcast probe instead of two. The former shape —
    # apply_aliases (broadcast left join on the alias dim) then an inner
    # join against clusters — ran every mention row through two
    # broadcast hash probes (~10s of the 11s mention_clusters action at
    # sf1.0/local[32], r7 probe: the bare cache scan is 0.9s). Both dims
    # are tiny, so precompute the preimage of `clusters` under aliasing
    # as ONE dimension keyed by raw norm_label: surfaces that
    # canonicalize into a clustered label, plus clustered labels that
    # are not themselves remapped surfaces (a remapped surface can never
    # canonicalize to itself). Inner-join semantics are preserved
    # exactly: a mention row survives iff its canonical label is in
    # clusters, with the same canon_label/cluster_id values.
    cl = clusters.select(F.col("label").alias("canon_label"), "cluster_id")
    dim_alias = (
        aliases.select(F.col("surface").alias("norm_label"),
                       F.col("canonical").alias("canon_label"))
        .join(cl, "canon_label")
        .select("norm_label", "canon_label", "cluster_id")
    )
    dim_direct = (
        cl.withColumn("norm_label", F.col("canon_label"))
        .join(aliases.select(F.col("surface").alias("norm_label")),
              "norm_label", "left_anti")
        .select("norm_label", "canon_label", "cluster_id")
    )
    mention_clusters = (
        mentions.join(F.broadcast(dim_alias.unionByName(dim_direct)),
                      "norm_label")
        .select("conv_id", "turn_idx", "platform", "ts", "mention",
                "norm_label", "mention_id", "pos", "canon_label",
                "cluster_id")
    )

    metrics: dict = dict(store.manifest)
    if collect_metrics:
        metrics["block_sizes"] = [
            r.asDict() for r in block_metrics(labels).orderBy(F.desc("n_labels")).limit(20).collect()
        ]
        metrics["score_histogram"] = [r.asDict() for r in score_distribution(scored).collect()]
        metrics["n_clusters"] = clusters.select("cluster_id").distinct().count()

    return ResolutionResult(
        mentions=mentions, labels=labels, pairs_scored=scored, edges=edges,
        clusters=clusters, mention_clusters=mention_clusters, metrics=metrics,
        extra_caches=extra_caches,
    )
