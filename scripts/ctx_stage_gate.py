"""Measure the salted context stage's 1v4 scaling where it actually RUNS
(VERDICT r5 #6): the bench corpus has no variant-shaped kernel-band pair,
so round 5's band pruning short-circuits ctx_build there — its salted
exact-top-K sample path (the round-5 fix for the hot-label window skew)
has never been measured under load.

Runs scripts/stage_scaling.py twice per rep — local[1] then local[4] —
with SPARK_GRAFT_STAGE_PLANT planting variant-shaped band pairs (kernel
in [0.62, 0.7), lev_ratio >= 0.8, machine-asserted in stage_scaling.py)
across 2,000 conversations per label, so the full sample -> context
vector -> bonus path is live in both arms. Per-stage efficiencies are
(T_1core / T_4core) / 4 on the per-stage best-of; the verdict's done-bar
is ctx_build >= 0.7.

Env: CTX_REPS (default 2), CTX_PLANT (default 20000 turns/label),
     CTX_SF (default 0.1), CTX_POOL (default scripts/ctx_stage_r6.jsonl).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_arm(cpus: int, sf: float, plant: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_STAGE_SF=str(sf),
        SPARK_GRAFT_STAGE_REPS="1",
        SPARK_GRAFT_STAGE_PLANT=str(plant),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "stage_scaling.py")],
        env=env, capture_output=True, text=True, timeout=3600, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    reps = int(os.environ.get("CTX_REPS", "2"))
    plant = int(os.environ.get("CTX_PLANT", "20000"))
    sf = float(os.environ.get("CTX_SF", "0.1"))
    pool = os.environ.get(
        "CTX_POOL", os.path.join(REPO, "scripts", "ctx_stage_r6.jsonl"))

    if not os.environ.get("CTX_ANALYZE_ONLY"):
        for i in range(reps):
            for cpus in (1, 4):
                r = run_arm(cpus, sf, plant)
                rec = {"rep": i, "cpus": cpus, "plant": plant,
                       "stages": r["stages"],
                       "ts": datetime.now(timezone.utc).isoformat()}
                with open(pool, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(json.dumps(rec), flush=True)

    rows = [json.loads(ln) for ln in open(pool) if ln.strip()]
    best: dict[int, dict[str, float]] = {}
    for r in rows:
        arm = best.setdefault(r["cpus"], {})
        for k, v in r["stages"].items():
            arm[k] = min(arm.get(k, 1e9), v)
    if 1 in best and 4 in best:
        eff = {k: round((best[1][k] / best[4][k]) / 4.0, 3)
               for k in best[1] if k in best[4] and best[4][k] > 0}
        print(json.dumps({"per_stage_best_1core": best[1],
                          "per_stage_best_4core": best[4],
                          "per_stage_efficiency": eff,
                          "ctx_build_pass": eff.get("ctx_build", 0) >= 0.7},
                         indent=2))


if __name__ == "__main__":
    main()
