"""Incremental processing (SURVEY.md §2.9 ST1-ST5).

The reference's event-driven path (stop hook -> RabbitMQ -> consumer ->
triplestore) maps to incremental batch over table snapshots:

- new transcript rows land in the turns table (Iceberg append in prod;
  a parquet directory here);
- `incremental_resolve` reads only conversations whose content hash is
  not in the processed-watermarks table (exactly-once effect via
  idempotent dedupe keys, ST3), runs the ER pipeline scoped to the
  changed conv_ids, and merges results;
- failures quarantine instead of poisoning the run (DLQ analog, ST2).

A Structured Streaming variant (`stream_turns`) shows the same DAG under
readStream + foreachBatch + Trigger.AvailableNow for deployments that
want the streaming runtime; the batch path is the primary one (the north
rule requires no event-time windowing).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from session_graph_spark.plans.checkpoint import conversation_watermarks
from session_graph_spark.plans.pipeline import resolve


class IncrementalRunner:
    """Stateful incremental ER over a growing turns store.

    min_sessions defaults to 1 here (not the batch pipeline's 2): the
    frequency filter is a corpus-wide property, and an incremental batch
    may contain a single changed conversation — pruning on batch-local
    session counts would silently drop every label. This mirrors the
    reference, where the watermark consumer ingests per-session and the
    min-sessions cut happens at entity-linking time over the full graph
    (link_entities.py --min-sessions)."""

    def __init__(self, spark: SparkSession, state_dir: str, min_sessions: int = 1,
                 resolve_fn=None):
        self.spark = spark
        self.state_dir = Path(state_dir)
        self.state_dir.mkdir(parents=True, exist_ok=True)
        self.min_sessions = min_sessions
        # injectable for fault-handling tests; production default is the
        # real pipeline
        self._resolve = resolve_fn or (
            lambda t: resolve(self.spark, t, min_sessions=self.min_sessions)
        )

    @property
    def _wm_path(self) -> str:
        return str(self.state_dir / "processed_watermarks")

    @property
    def _clusters_path(self) -> str:
        return str(self.state_dir / "clusters")

    @property
    def _dlq_path(self) -> str:
        return str(self.state_dir / "quarantine")

    def processed(self) -> DataFrame | None:
        if Path(self._wm_path).exists():
            return self.spark.read.parquet(self._wm_path)
        return None

    def quarantined(self) -> DataFrame | None:
        """The dead-letter table: (conv_id, content_hash, error)."""
        if Path(self._dlq_path).exists():
            return self.spark.read.parquet(self._dlq_path)
        return None

    def run(self, turns: DataFrame) -> DataFrame:
        """Process new/changed conversations; returns this batch's
        mention-cluster assignment. Unchanged conversations cost nothing
        (anti-join skip, reference watermark semantics P12). A failing
        batch quarantines instead of poisoning the run (ST2, the DLQ
        analog of the reference's RabbitMQ dead-letter queue): the
        failure is bisected down to the poison conversations, which land
        in the quarantine table and are watermarked so they are not
        retried until their content changes; every healthy conversation
        in the batch still commits."""
        wm = conversation_watermarks(turns).cache()
        prev = self.processed()
        if prev is not None:
            todo = wm.join(prev, ["conv_id", "content_hash"], "left_anti")
        else:
            todo = wm
        todo = todo.cache()
        if todo.count() == 0:
            return self.spark.createDataFrame(
                [], "conv_id string, canon_label string, cluster_id string"
            )
        batch_turns = turns.join(F.broadcast(todo.select("conv_id")), "conv_id", "left_semi")
        try:
            res = self._resolve(batch_turns)
        except Exception:  # noqa: BLE001 - isolate the poison conversations
            return self._run_with_quarantine(turns, wm, todo)
        # sever lineage BEFORE updating the watermark table: the returned
        # DataFrame's plan must not re-read a parquet path this method is
        # about to overwrite (the overwrite invalidates dependent caches
        # and a later action would re-plan against the new watermarks)
        out = res.mention_clusters.select(
            "conv_id", "canon_label", "cluster_id"
        ).localCheckpoint(eager=True)
        # lineage is severed: drop this batch's cached stages so a
        # long-running service doesn't accumulate one cache set per batch
        res.unpersist()
        # merge-by-conv_id, not blind append: a *changed* conversation's
        # old assignment rows must be replaced or readers of the clusters
        # table see stale duplicates forever
        self._merge_overwrite(self._clusters_path, out, todo.select("conv_id"))
        # watermark merge must keep the NEW hash for changed conv_ids —
        # unionByName+dropDuplicates keeps an arbitrary row, which can
        # resurrect the stale hash and re-process the conversation forever
        # a conversation that processed cleanly leaves the dead-letter
        # table (its content changed since it was quarantined). This MUST
        # run before the watermark overwrite below: todo's cached plan
        # reads the watermark table, and overwriting it invalidates the
        # cache, after which todo would recompute as empty
        dlq = self.quarantined()
        if dlq is not None:
            self._atomic_overwrite(
                self._dlq_path,
                dlq.join(todo.select("conv_id"), "conv_id", "left_anti"),
            )
        new_wm = wm if prev is None else (
            prev.join(todo.select("conv_id"), "conv_id", "left_anti").unionByName(todo)
        )
        self._atomic_overwrite(self._wm_path, new_wm)
        return out

    def _run_with_quarantine(self, turns: DataFrame, wm: DataFrame,
                             todo: DataFrame) -> DataFrame:
        """ST2 failure isolation: bisect the failing batch down to the
        poison conversations. Healthy conversations commit exactly as the
        happy path would; poison ones land in the quarantine table with
        their error, get watermarked (so they are NOT retried until their
        content changes), and their stale cluster rows are dropped rather
        than left to serve outdated content. Driver-side recursion only
        runs on the failure path and is bounded by the batch's
        conversation count."""
        conv_ids = sorted(
            r["conv_id"] for r in todo.select("conv_id").distinct().collect()
        )
        good_parts: list[DataFrame] = []
        bad: list[tuple[str, str]] = []

        def process(ids: list[str]) -> None:
            subset = turns.join(
                F.broadcast(self.spark.createDataFrame(
                    [(c,) for c in ids], "conv_id string"
                )),
                "conv_id", "left_semi",
            )
            try:
                res = self._resolve(subset)
                out = res.mention_clusters.select(
                    "conv_id", "canon_label", "cluster_id"
                ).localCheckpoint(eager=True)
                res.unpersist()
                good_parts.append(out)
            except Exception as exc:  # noqa: BLE001
                if len(ids) == 1:
                    bad.append((ids[0], str(exc)[:500]))
                else:
                    mid = len(ids) // 2
                    process(ids[:mid])
                    process(ids[mid:])

        process(conv_ids)

        out = self.spark.createDataFrame(
            [], "conv_id string, canon_label string, cluster_id string"
        )
        for p in good_parts:
            out = out.unionByName(p)
        # replaced set = ALL todo convs: healthy ones get fresh rows,
        # poison ones get their stale rows dropped
        self._merge_overwrite(self._clusters_path, out, todo.select("conv_id"))

        # dead-letter table: (old minus this batch's convs) + the fresh
        # poison rows, carrying the content hash that failed
        add = self.spark.createDataFrame(
            bad, "conv_id string, error string"
        ).join(todo.select("conv_id", "content_hash"), "conv_id").select(
            "conv_id", "content_hash", "error"
        )
        old_dlq = self.quarantined()
        new_dlq = add if old_dlq is None else (
            old_dlq.join(todo.select("conv_id"), "conv_id", "left_anti")
            .unionByName(add)
        )
        self._atomic_overwrite(self._dlq_path, new_dlq)

        # watermark EVERY todo conv (incl. poison): quarantined content is
        # not retried until the conversation's hash changes
        prev = self.processed()
        new_wm = wm if prev is None else (
            prev.join(todo.select("conv_id"), "conv_id", "left_anti").unionByName(todo)
        )
        self._atomic_overwrite(self._wm_path, new_wm)
        return out

    def _atomic_overwrite(self, path: str, df: DataFrame) -> None:
        """Overwrite a parquet table whose current contents may feed the
        plan being written: stage through .tmp, then rewrite."""
        df.write.mode("overwrite").parquet(path + ".tmp")
        self.spark.read.parquet(path + ".tmp").write.mode("overwrite").parquet(path)

    def _merge_overwrite(self, path: str, new_rows: DataFrame,
                         replaced_convs: DataFrame) -> None:
        """Upsert semantics over a parquet table keyed by conv_id (the
        Iceberg MERGE INTO analog): drop existing rows for the replaced
        conversations, union the new rows."""
        if Path(path).exists():
            existing = self.spark.read.parquet(path)
            merged = existing.join(
                F.broadcast(replaced_convs), "conv_id", "left_anti"
            ).unionByName(new_rows)
            self._atomic_overwrite(path, merged)
        else:
            new_rows.write.mode("overwrite").parquet(path)


def stream_turns(spark: SparkSession, input_dir: str, schema: str,
                 checkpoint_dir: str, process_batch) -> "object":
    """Structured Streaming wrapper: file-source stream of turn rows,
    foreachBatch(process_batch), Trigger.AvailableNow (drain-and-stop)."""
    stream = (
        spark.readStream.schema(schema).parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
