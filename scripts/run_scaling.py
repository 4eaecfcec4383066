"""Two-parallelism scaling evidence (north rule: N vs 4N executors).

The sandbox has no real cluster, so the same bench runs at local[N] and
local[4N] on identical input; scaling efficiency =
(throughput_4N / throughput_N) / 4. Results are appended to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str) -> dict:
    # reps at this level already take a min across whole invocations;
    # keep bench's internal ER best-of at 1 so each rep stays cheap
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_ER_REPS="1", SPARK_GRAFT_HEADLINE_ONLY="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # default N=4 -> local[4] vs local[16]: the 4N side must not
    # oversubscribe the 32-core box (N JVM task threads + N Python UDF
    # workers run concurrently per side)
    n = int(os.environ.get("SCALING_N", "4"))
    reps = int(os.environ.get("SCALING_REPS", "2"))
    pairs = []
    for cpus in (n, 4 * n):
        # best-of-N: the sandbox VM shows ~2x noisy-neighbor variance on
        # identical runs; min is the standard noise-resistant estimator
        runs = [run(cpus, sf_dir) for _ in range(reps)]
        r = min(runs, key=lambda x: x["queries"]["er_pipeline"])
        pairs.append(r)
        all_t = [x["queries"]["er_pipeline"] for x in runs]
        print(f"local[{cpus}]: er_pipeline best {r['queries']['er_pipeline']}s "
              f"of {all_t}, {r['er_turns_per_sec']} turns/sec, total {r['value']}s")
    thr_n, thr_4n = pairs[0]["er_turns_per_sec"], pairs[1]["er_turns_per_sec"]
    eff = round((thr_4n / thr_n) / 4.0, 3)
    speedup = round(thr_4n / thr_n, 2)
    print(f"speedup x{speedup}, scaling efficiency {eff}")

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Scaling run {stamp} — {sf_dir}\n\n"
            f"| parallelism | er_pipeline sec | turns/sec | total bench sec |\n"
            f"|---|---|---|---|\n"
            f"| local[{n}] | {pairs[0]['queries']['er_pipeline']} | {thr_n} | {pairs[0]['value']} |\n"
            f"| local[{4*n}] | {pairs[1]['queries']['er_pipeline']} | {thr_4n} | {pairs[1]['value']} |\n\n"
            f"speedup **x{speedup}**, scaling efficiency **{eff}** "
            f"(ideal 1.0 = linear in cores; target >= 0.8)\n\n"
            f"per-query (local[{4*n}]): "
            + ", ".join(f"{k}={v}s" for k, v in pairs[1]["queries"].items())
            + f"\n\ncorpus: {pairs[1]['er_turns']} turns, sf={pairs[1]['sf']}\n"
        )


if __name__ == "__main__":
    main()
