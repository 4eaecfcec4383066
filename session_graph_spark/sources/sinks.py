"""Sinks (SURVEY.md §2.1 S7/S8).

- turtle_lines / write_turtle: serialize the engine's tables to W3C
  Turtle so a user of the reference can load our output into the same
  triplestore (the reference's .ttl sink, jsonl_to_rdf.py:273). The
  formatter is a JVM-side column expression per row; writing is
  spark.write.text — no driver-side loop.
- write_serving_table: the Fuseki-upload analog — append to a serving
  parquet/Iceberg table and verify with a count (load_fuseki.py:76-94).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from session_graph_spark.functions.normalize import slug

PREFIXES = (
    "@prefix devkg: <http://devkg.example.org/ontology#> .\n"
    "@prefix data: <http://devkg.example.org/data/> .\n"
    "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n"
    "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
)


def _esc(col):
    # Turtle string escape: backslash and double-quote. In Java's
    # replaceAll the *replacement* string also treats backslash as an
    # escape, so a literal \" needs four backslashes in the pattern
    # string ('\\\\' -> one literal backslash in output).
    return F.regexp_replace(F.regexp_replace(col, r"\\", "\\\\\\\\"), '"', '\\\\"')


def turtle_lines(reified: DataFrame) -> DataFrame:
    """Reified triple rows -> one Turtle statement block per row."""
    s = F.concat(F.lit("data:entity/"), slug("subject"))
    o = F.concat(F.lit("data:entity/"), slug("object"))
    line = F.concat(
        F.lit("data:triple/"), F.col("triple_id"), F.lit(" a devkg:KnowledgeTriple ; "),
        F.lit("rdf:subject "), s, F.lit(" ; rdf:predicate devkg:"), F.col("predicate"),
        F.lit(" ; rdf:object "), o,
        F.lit(' ; devkg:extractedFrom "'), _esc(F.col("conv_id")), F.lit('" .'),
    )
    direct = F.concat(s, F.lit(" devkg:"), F.col("predicate"), F.lit(" "), o, F.lit(" ."))
    return reified.select(F.concat_ws("\n", direct, line).alias("value"))


def write_turtle(reified: DataFrame, path: str) -> None:
    """Write a .ttl directory: a prefix header part + statement parts.
    Output file count is sized from the cluster's default parallelism
    (a plan-independent constant) — deriving it from the input would
    force a plan->RDD conversion just to read a partition count."""
    spark = reified.sparkSession
    header = spark.createDataFrame([(PREFIXES,)], ["value"])
    n_out = max(1, spark.sparkContext.defaultParallelism // 4)
    header.unionByName(turtle_lines(reified)).coalesce(n_out) \
        .write.mode("overwrite").text(path)


def _has_uri_scheme(path: str) -> bool:
    """True for any scheme-prefixed path (file:/, hdfs://x, s3a:/x —
    Hadoop accepts single-slash URI forms too). Such paths are not
    driver-glob-listable, so the append verify must use the count-delta
    fallback."""
    import re

    return re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:/", path) is not None


def write_serving_table(df: DataFrame, path: str, expect_min_rows: int = 1) -> int:
    """S8 analog: append to the serving table and verify the APPENDED
    batch with a count over only the newly written files — the reference's
    per-upload COUNT verify is per-graph, not per-store
    (load_fuseki.py:76-94), and a full-table recount would cost O(table
    history) on every append. Returns the appended row count.

    File-diff listing only works where the driver can list the path
    (local filesystem). For URI paths (file:/, hdfs://, s3a://) the
    local glob sees nothing — there the verify falls back to a
    before/after full-table count delta (correct, but O(table history);
    an object-store deployment should swap in the commit manifest the
    output committer produces)."""
    import glob
    import os

    spark = df.sparkSession
    is_local = not _has_uri_scheme(path)

    def _files() -> set[str]:
        return set(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))

    def _table_count() -> int:
        from pyspark.errors import AnalysisException

        try:
            return spark.read.parquet(path).count()
        except AnalysisException:  # table does not exist yet
            return 0
        # any OTHER failure (throttling, transient IO) propagates: folding
        # it into 0 would corrupt the before/after delta — a pre-append
        # read glitch would over-report the appended rows and wave a
        # partial append through the expect_min_rows verify

    if is_local:
        before = _files() if os.path.isdir(path) else set()
        df.write.mode("append").parquet(path)
        new = sorted(_files() - before)
        if not new:
            raise RuntimeError(f"serving table {path}: append produced no files")
        n = spark.read.parquet(*new).count()
    else:
        n_before = _table_count()
        df.write.mode("append").parquet(path)
        n = _table_count() - n_before
    if n < expect_min_rows:
        raise RuntimeError(
            f"serving table {path} append wrote {n} rows < {expect_min_rows}"
        )
    return n
