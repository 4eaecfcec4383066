"""spark-submit --py-files execution-mode test (north star / SURVEY §7
M7: the job is SUBMITTED as a zipped package to a cluster, not run from
a source checkout). Builds session_graph_spark.zip exactly as a deploy
would, then runs scripts/submit_job.py through pyspark's own
spark-submit with the repo stripped from the child's import path — the
archive must satisfy every import on the driver AND inside the Python
UDF workers — and checks the written clusters bit-match an in-process
resolve() on the same input."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_pkg_zip(zip_path: str) -> None:
    pkg = os.path.join(REPO, "session_graph_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files_runs_pipeline(spark, tmp_path):
    from session_graph_spark import corpus
    from session_graph_spark.plans.pipeline import resolve

    turns_path = str(tmp_path / "turns")
    corpus.generate_turns_distributed(
        spark, n_convs=80, seed=11, partitions=4
    ).write.parquet(turns_path)

    zip_path = str(tmp_path / "session_graph_spark.zip")
    _build_pkg_zip(zip_path)
    out_dir = str(tmp_path / "out")

    submit = os.path.join(os.path.dirname(pyspark.__file__),
                          "bin", "spark-submit")
    # the child must resolve the package from the --py-files zip alone:
    # drop PYTHONPATH and run from tmp so neither the env nor the cwd
    # leaks the source checkout onto sys.path
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [submit, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", f"spark.sql.warehouse.dir={tmp_path}/warehouse",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_job.py"),
         "--turns", turns_path, "--out", out_dir],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    stats = json.loads(line)

    res = resolve(spark, spark.read.parquet(turns_path))
    expect = {(r["label"], r["cluster_id"]) for r in res.clusters.collect()}
    got = {(r["label"], r["cluster_id"])
           for r in spark.read.parquet(f"{out_dir}/clusters").collect()}
    assert got == expect != set()
    assert stats["n_labels"] == len(expect)
    assert stats["n_clusters"] == len({c for _, c in expect})
    assert stats["n_mentions"] == res.mention_clusters.count()
    res.unpersist()
