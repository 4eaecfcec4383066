"""SparkSession factory with the configs this engine relies on.

Tuned for the sandbox (single-JVM local[N]) but every setting is the one
we'd ship to a 1000-executor cluster: AQE on (partition coalescing + skew
join splitting), Arrow transfer for all pandas UDFs, and a shuffle
partition count that AQE can coalesce downward.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "session-graph-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    n_str = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
    n_threads = 32 if n_str == "*" else int(n_str)
    if shuffle_partitions is None:
        # match parallelism; AQE coalesces small shuffles back down
        shuffle_partitions = n_threads
    # The string-heavy stages (regex extraction, dedup shuffles) are
    # memory-bandwidth-bound, not ALU-bound: measured on this class of
    # host, per-task throughput degrades ~6x at 16 concurrent tasks and
    # ~23x at 32 (BENCH.md microbench). Above 16 threads we allocate two
    # hardware threads' worth of bandwidth per task (spark.task.cpus=2) —
    # the same sizing a memory-bound job ships with on a real cluster —
    # which halves concurrent tasks and restores near-knee throughput
    # (130s -> 67s for the sf0.1 ER pipeline at local[32]).
    task_cpus = "2" if n_threads > 16 else "1"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.task.cpus", task_cpus)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # size-based coalescing: tiny shuffles (distinct labels, pairs)
        # collapse to one task instead of fanning out N near-empty tasks;
        # 16m advisory keeps big shuffles at healthy parallelism
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
