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

import json
import os
import shutil
import warnings
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
                 resolve_fn=None, n_parts: int = 16):
        self.spark = spark
        self.state_dir = Path(state_dir)
        self.state_dir.mkdir(parents=True, exist_ok=True)
        self.min_sessions = min_sessions
        # state tables (clusters / watermarks / quarantine) are hash-
        # partitioned by conv_id into n_parts buckets so a batch rewrites
        # only the partitions it touches — per-batch write cost is
        # O(batch + touched partitions), never O(total history). Size
        # n_parts so one partition's rows fit an executor comfortably
        # (at 10^12 turns: thousands, not 16 — it only changes the
        # directory fan-out, not the plan shape)
        self.n_parts = n_parts
        # fail fast if any existing state table was written under a
        # different n_parts: part = pmod(xxhash64(conv_id), n_parts), so a
        # mismatched runner would compute different partitions for the
        # same conv_id and merge around stale rows it can never see
        for p in (self._wm_path, self._clusters_path, self._dlq_path):
            self._load_manifest(p)
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

    _STATE_SCHEMAS = {
        "processed_watermarks": "conv_id string, content_hash string",
        "clusters": "conv_id string, canon_label string, cluster_id string",
        "quarantine": "conv_id string, content_hash string, error string",
    }

    # ---------------------------------------------------------------
    # generation-pointer state-store protocol
    #
    # Layout:   <table>/_MANIFEST.json          (the atomic pointer)
    #           <table>/gen=<g>/part=<p>/*.parquet   (immutable data)
    #
    # The manifest maps each hash partition to the generation that holds
    # its current rows. A merge writes the touched partitions into a NEW
    # generation directory, then commits by atomically replacing the
    # manifest (write tmp + fsync + os.replace — one rename is the whole
    # commit). Readers resolve the manifest, so a crash at ANY point
    # before the replace leaves the complete pre-merge state visible;
    # uncommitted generation directories are detected and garbage-
    # collected (with a warning) by the next merge. This is the local-FS
    # analog of Iceberg's metadata-pointer commit (the production target;
    # no Iceberg runtime jar in this sandbox, BASELINE.md).
    # ---------------------------------------------------------------

    def _load_manifest(self, path: str) -> dict | None:
        f = Path(path) / "_MANIFEST.json"
        if not f.exists():
            # a manifest-less dir that nevertheless holds flat part=P
            # data is the pre-generation (swap-protocol) layout: migrate
            # it in place (renames into gen=0 + one manifest commit)
            # instead of silently treating committed state as empty —
            # which would reprocess every conversation and orphan the
            # old rows forever
            root = Path(path)
            legacy = sorted(root.glob("part=*")) if root.exists() else []
            gen_dir = root / "gen=0"
            # IDEMPOTENT RESTART of a crashed earlier migration: the
            # rename loop below moves partitions one by one, so a crash
            # mid-loop leaves some dirs already inside gen=0 with no
            # manifest. Those hold COMMITTED rows — they must be unioned
            # into this migration's manifest, or the committed manifest
            # would omit them and the next merge's pre-write GC would
            # silently delete them (they sit at g=0, below the committed
            # gen, so the crashed-write heuristic treats them as routine
            # post-commit leftovers).
            moved = sorted(gen_dir.glob("part=*")) if gen_dir.exists() else []
            if not legacy and not moved:
                return None
            # the legacy layout never recorded n_parts; a store written
            # under a LARGER n_parts is detectable (some index out of
            # range) and must fail fast — migrating it would hash
            # conv_ids to the wrong partitions on every later merge
            # (exactly the stale-row corruption the manifest's n_parts
            # pin exists to prevent). A smaller-n_parts store whose
            # indices all happen to fit is undetectable by construction;
            # that is why the manifest pins n_parts going forward.
            bad = [d.name for d in legacy + moved
                   if not 0 <= int(d.name.split("=", 1)[1]) < self.n_parts]
            if bad:
                raise ValueError(
                    f"state table {path}: pre-manifest layout has "
                    f"partition dirs {bad} outside n_parts="
                    f"{self.n_parts}; it was written under a different "
                    "n_parts. Reopen with the original n_parts (or "
                    "rewrite the state dir).")
            warnings.warn(
                f"state table {path}: migrating pre-manifest layout "
                f"({len(legacy)} flat partition dirs"
                + (f" + {len(moved)} already moved by a crashed earlier "
                   "migration" if moved else "")
                + ") to the generation-pointer format", stacklevel=2)
            gen_dir.mkdir(exist_ok=True)
            parts = {d.name.split("=", 1)[1]: 0 for d in moved}
            for d in legacy:
                if (gen_dir / d.name).exists():
                    # cannot arise from a crash (rename is atomic: a dir
                    # is either flat or moved, never both) — refuse to
                    # guess which copy is current
                    raise RuntimeError(
                        f"state table {path}: partition {d.name} exists "
                        "both flat and under gen=0; ambiguous layout, "
                        "manual repair required")
                d.rename(gen_dir / d.name)
                parts[d.name.split("=", 1)[1]] = 0
            man = {"version": 1, "n_parts": self.n_parts, "gen": 0,
                   "parts": {k: parts[k] for k in sorted(parts, key=int)}}
            self._commit_manifest(path, man)
            return man
        man = json.loads(f.read_text())
        if man["n_parts"] != self.n_parts:
            raise ValueError(
                f"state table {path} was written with n_parts="
                f"{man['n_parts']} but this runner was opened with "
                f"n_parts={self.n_parts}; partition assignment is "
                "pmod(xxhash64(conv_id), n_parts), so merging under a "
                "different n_parts would rewrite the wrong partitions "
                "and leave stale rows behind. Reopen with the original "
                "n_parts (or rewrite the state dir)."
            )
        return man

    def _commit_manifest(self, path: str, man: dict,
                         expect_gen: int | None = None) -> None:
        """THE commit point: one atomic rename of the pointer file.

        The protocol is SINGLE-WRITER (like Iceberg's optimistic commit,
        minus the retry loop): concurrent merges on one state dir are a
        deployment error. `expect_gen` makes the realistic race fail
        loudly instead of silently losing an update — if another writer
        committed since this merge read its base manifest, the on-disk
        generation no longer matches and we refuse to clobber it."""
        if expect_gen is not None:
            f = Path(path) / "_MANIFEST.json"
            on_disk = json.loads(f.read_text())["gen"] if f.exists() else 0
            if on_disk != expect_gen:
                raise RuntimeError(
                    f"state table {path}: concurrent writer detected "
                    f"(manifest moved gen {expect_gen} -> {on_disk} "
                    "during this merge); the store is single-writer")
        tmp = Path(path) / "_MANIFEST.json.tmp"
        with open(tmp, "w") as fh:
            fh.write(json.dumps(man, sort_keys=True))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, Path(path) / "_MANIFEST.json")
        # fsync the directory so the rename itself is durable
        dirfd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(dirfd)
        finally:
            os.close(dirfd)

    def _gc_unreferenced(self, path: str, man: dict, pre_write: bool = False) -> None:
        """Remove every gen=*/part=* directory the manifest does not
        reference: superseded partitions after a commit, and — on the
        pre_write pass — uncommitted leftovers of a crashed merge, which
        are surfaced with a warning rather than silently overwritten
        (the manifest never referenced them, so discarding them IS the
        rollback to the last committed state)."""
        ref = {(int(g), int(k)) for k, g in man["parts"].items()}
        for gd in Path(path).glob("gen=*"):
            g = int(gd.name.split("=", 1)[1])
            for pd in gd.glob("part=*"):
                q = int(pd.name.split("=", 1)[1])
                if (g, q) not in ref:
                    # only generations ABOVE the committed one are a
                    # rolled-back crashed WRITE; unreferenced dirs at or
                    # below it are committed-then-superseded leftovers of
                    # an interrupted post-commit GC — cleaning those is
                    # routine, and warning about them would read as a
                    # false data-loss alarm
                    if pre_write and g > man.get("gen", 0):
                        warnings.warn(
                            f"state table {path}: discarding uncommitted "
                            f"partition {gd.name}/{pd.name} left by a "
                            "crashed merge (rolling back to the committed "
                            "manifest)", stacklevel=2)
                    shutil.rmtree(pd, ignore_errors=True)
            if not any(gd.glob("part=*")):
                shutil.rmtree(gd, ignore_errors=True)

    def _part_dirs(self, path: str, man: dict, parts: list[int] | None = None
                   ) -> list[str]:
        cur = {int(k): g for k, g in man["parts"].items()}
        keys = sorted(cur) if parts is None else [q for q in parts if q in cur]
        return [str(Path(path) / f"gen={cur[q]}" / f"part={q}") for q in keys]

    def _read_state(self, path: str) -> DataFrame | None:
        """Read a state table via its manifest, hiding the internal gen/
        hash-bucket partition columns from callers. A table whose last
        rows were merged away (e.g. a fully-healed quarantine) has an
        empty partition map — return a typed empty DataFrame, not an
        error."""
        man = self._load_manifest(path)
        if man is None:
            return None
        dirs = self._part_dirs(path, man)
        if not dirs:
            return self.spark.createDataFrame([], self._STATE_SCHEMAS[Path(path).name])
        df = self.spark.read.option("basePath", path).parquet(*dirs)
        return df.drop("gen", "part")

    def processed(self) -> DataFrame | None:
        return self._read_state(self._wm_path)

    def quarantined(self) -> DataFrame | None:
        """The dead-letter table: (conv_id, content_hash, error)."""
        return self._read_state(self._dlq_path)

    def clusters(self) -> DataFrame | None:
        """The merged clusters state table: (conv_id, canon_label,
        cluster_id)."""
        return self._read_state(self._clusters_path)

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
            # steady-state no-op path needs the same cache hygiene as the
            # other exits: a service polling an unchanged corpus would
            # otherwise accumulate two cached frames per poll
            wm.unpersist()
            todo.unpersist()
            return self.spark.createDataFrame(
                [], "conv_id string, canon_label string, cluster_id string"
            )
        batch_turns = turns.join(F.broadcast(todo.select("conv_id")), "conv_id", "left_semi")
        try:
            res = self._resolve(batch_turns)
            # sever lineage BEFORE updating the watermark table: the
            # returned DataFrame's plan must not re-read a parquet path
            # this method is about to overwrite (the overwrite
            # invalidates dependent caches and a later action would
            # re-plan against the new watermarks). The eager checkpoint
            # ALSO runs inside the quarantine guard: a poison
            # conversation whose failure only surfaces at this action
            # (lazy plans, cache-evicted recompute of the extraction
            # UDF) must still bisect into the DLQ, not fail the batch
            out = res.mention_clusters.select(
                "conv_id", "canon_label", "cluster_id"
            ).localCheckpoint(eager=True)
        except Exception:  # noqa: BLE001 - isolate the poison conversations
            out = self._run_with_quarantine(turns, todo)
            wm.unpersist()
            todo.unpersist()
            return out
        # lineage is severed: drop this batch's cached stages so a
        # long-running service doesn't accumulate one cache set per batch
        res.unpersist()
        # merge-by-conv_id, not blind append: a *changed* conversation's
        # old assignment rows must be replaced or readers of the clusters
        # table see stale duplicates forever
        self._merge_overwrite(self._clusters_path, out, todo.select("conv_id"))
        # a conversation that processed cleanly leaves the dead-letter
        # table (its content changed since it was quarantined). This MUST
        # run before the watermark merge below: todo's cached plan reads
        # the watermark table, and rewriting it must not race todo's
        # recompute if the cache is ever evicted
        if self.quarantined() is not None:
            self._merge_overwrite(
                self._dlq_path,
                self.spark.createDataFrame(
                    [], "conv_id string, content_hash string, error string"
                ),
                todo.select("conv_id"),
            )
        # watermark merge keeps the NEW hash for changed conv_ids: the
        # partition-scoped MERGE replaces exactly the todo conversations'
        # rows and leaves every other partition's files untouched
        self._merge_overwrite(self._wm_path, todo, todo.select("conv_id"))
        # per-batch cache hygiene (long-running service): this batch's
        # wm/todo caches are dead weight once the state tables are merged
        wm.unpersist()
        todo.unpersist()
        return out

    def _run_with_quarantine(self, turns: DataFrame,
                             todo: DataFrame) -> DataFrame:
        """ST2 failure isolation: bisect the failing batch down to the
        poison conversations, then re-resolve ALL healthy conversations
        together in one final pass — so labels that co-cluster across
        bisection halves (typo variants spanning conversations) get
        exactly the cluster ids the happy path would have produced.
        Poison conversations land in the quarantine table with their
        error, get watermarked (so they are NOT retried until their
        content changes), and their stale cluster rows are dropped rather
        than left to serve outdated content. Driver-side recursion only
        runs on the failure path and is bounded by the batch's
        conversation count; the bisection probes discard their outputs
        (they exist only to locate the poison)."""
        conv_ids = sorted(
            r["conv_id"] for r in todo.select("conv_id").distinct().collect()
        )
        bad: list[tuple[str, str]] = []

        def subset_of(ids: list[str]) -> DataFrame:
            return turns.join(
                F.broadcast(self.spark.createDataFrame(
                    [(c,) for c in ids], "conv_id string"
                )),
                "conv_id", "left_semi",
            )

        def probe(ids: list[str]) -> None:
            try:
                res = self._resolve(subset_of(ids))
                # force execution so lazily-surfacing failures count
                res.mention_clusters.select(
                    "conv_id", "canon_label", "cluster_id"
                ).localCheckpoint(eager=True)
                res.unpersist()
            except Exception as exc:  # noqa: BLE001
                if len(ids) == 1:
                    bad.append((ids[0], str(exc)[:500]))
                else:
                    mid = len(ids) // 2
                    probe(ids[:mid])
                    probe(ids[mid:])

        probe(conv_ids)

        def resolve_committed(ids: list[str]) -> DataFrame:
            res = self._resolve(subset_of(ids))
            chk = res.mention_clusters.select(
                "conv_id", "canon_label", "cluster_id"
            ).localCheckpoint(eager=True)
            res.unpersist()
            return chk

        empty = self.spark.createDataFrame(
            [], "conv_id string, canon_label string, cluster_id string"
        )
        healthy = [c for c in conv_ids if c not in {b for b, _ in bad}]
        if healthy:
            # one combined resolve over every healthy conversation: the
            # committed assignment is identical to a batch that never
            # contained the poison conversations
            try:
                out = resolve_committed(healthy)
            except Exception:  # noqa: BLE001 - batch-SCALE failure
                # the combined set failed even though every conversation
                # passed its probe (memory/scale or cross-conversation
                # interaction — bisection cannot localize it). Degraded
                # emergency path: resolve each conversation alone so
                # healthy data still commits (cross-conversation merges
                # are lost for this batch; the next content change
                # re-resolves them together), quarantining any conv that
                # fails even solo
                parts_out = []
                for c in healthy:
                    try:
                        parts_out.append(resolve_committed([c]))
                    except Exception as exc:  # noqa: BLE001
                        bad.append((c, str(exc)[:500]))
                out = empty
                for p_df in parts_out:
                    out = out.unionByName(p_df)
        else:
            out = empty
        # replaced set = ALL todo convs: healthy ones get fresh rows,
        # poison ones get their stale rows dropped
        self._merge_overwrite(self._clusters_path, out, todo.select("conv_id"))

        # dead-letter MERGE: replace this batch's convs' rows with the
        # fresh poison rows (healthy convs leave the DLQ, poison ones
        # carry the content hash that failed)
        add = self.spark.createDataFrame(
            bad, "conv_id string, error string"
        ).join(todo.select("conv_id", "content_hash"), "conv_id").select(
            "conv_id", "content_hash", "error"
        )
        self._merge_overwrite(self._dlq_path, add, todo.select("conv_id"))

        # watermark EVERY todo conv (incl. poison): quarantined content is
        # not retried until the conversation's hash changes
        self._merge_overwrite(self._wm_path, todo, todo.select("conv_id"))
        return out

    def _with_part(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "part", F.pmod(F.xxhash64("conv_id"), F.lit(self.n_parts))
        )

    def _parts_of(self, convs: DataFrame) -> list[int]:
        return sorted(
            r["part"]
            for r in self._with_part(convs.select("conv_id").distinct())
            .select("part").distinct().collect()
        )

    def _merge_overwrite(self, path: str, new_rows: DataFrame,
                         replaced_convs: DataFrame) -> None:
        """Partition-scoped, CRASH-ATOMIC upsert over a conv_id-keyed
        state table (the Iceberg MERGE INTO analog): state tables are
        hash-partitioned by pmod(xxhash64(conv_id), n_parts); a merge
        reads ONLY the partitions containing replaced conversations
        (manifest-resolved path list, so the scan is partition-pruned by
        construction), writes the merged partitions into a fresh
        generation directory, and commits with one atomic manifest
        rename — so each batch costs O(batch + touched partitions),
        never a full-table rewrite, and a crash at any point leaves the
        complete pre-merge state visible. An empty merged partition
        simply drops out of the new manifest (the partition-delete case
        Spark's dynamic overwrite gets wrong)."""
        p = Path(path)
        p.mkdir(parents=True, exist_ok=True)
        man = self._load_manifest(path) or {
            "version": 1, "n_parts": self.n_parts, "gen": 0, "parts": {},
        }
        # crash recovery: drop (loudly) any generation directories a
        # crashed merge left behind but never committed
        self._gc_unreferenced(path, man, pre_write=True)
        # touched partitions = replaced convs' AND new rows' — a new_rows
        # conv the caller forgot to list in replaced_convs still lands
        # (true upsert); without the union its partition would silently
        # keep the old generation in the new manifest
        parts = sorted(set(self._parts_of(replaced_convs))
                       | set(self._parts_of(new_rows)))
        if not parts:
            return
        touched_dirs = self._part_dirs(path, man, parts)
        if touched_dirs:
            kept = (
                self.spark.read.option("basePath", path).parquet(*touched_dirs)
                .drop("gen", "part")
                .join(F.broadcast(replaced_convs), "conv_id", "left_anti")
            )
            merged = kept.unionByName(new_rows)
        else:
            merged = new_rows
        next_gen = man["gen"] + 1
        gen_dir = p / f"gen={next_gen}"
        self._with_part(merged).write.partitionBy("part") \
            .mode("overwrite").parquet(str(gen_dir))
        written = {int(d.name.split("=", 1)[1])
                   for d in gen_dir.glob("part=*") if d.is_dir()}
        new_parts = {int(k): g for k, g in man["parts"].items()
                     if int(k) not in set(parts)}
        new_parts.update({q: next_gen for q in written})
        man2 = {
            "version": 1, "n_parts": self.n_parts, "gen": next_gen,
            "parts": {str(k): new_parts[k] for k in sorted(new_parts)},
        }
        self._commit_manifest(path, man2, expect_gen=man["gen"])
        # post-commit GC of the superseded partition directories; a crash
        # here only leaves unreferenced dirs for the next pre-write pass
        self._gc_unreferenced(path, man2)
        # the manifest swap is invisible to Spark's CacheManager: without
        # this refresh the NEXT batch's todo anti-join can be served from
        # the PREVIOUS batch's cached plan (matched by canonicalized
        # plan!) and re-process the same conversations forever
        self.spark.catalog.refreshByPath(path)


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
