"""Render the round-6 gate pools into BENCH.md (replaces the
<!-- R6_GATE_RESULT --> marker with the pool table + pre-registered
estimator readout). Pure file I/O — safe to run while nothing else is."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    pool_path = os.path.join(REPO, "scripts", "gate_r6_pools.jsonl")
    rows = [json.loads(ln) for ln in open(pool_path) if ln.strip()]
    t1 = sorted(r["er_sec"] for r in rows if r["cpus"] == 1)
    t4 = sorted(r["er_sec"] for r in rows if r["cpus"] == 4)
    turns = rows[0]["turns"]
    eff = (t1[1] / t4[1]) / 4.0
    strict = (t1[0] / t4[0]) / 4.0
    fmt = lambda xs: " / ".join(f"{x:.1f}" for x in xs)  # noqa: E731
    verdict = "PASS" if eff >= 0.8 else "FAIL"
    block = f"""| arm | n | best | 2nd-best | turns/s (2nd-best) | full sorted pool (s) |
   |---|---|---|---|---|---|
   | local[1] | {len(t1)} | {t1[0]:.1f} s | {t1[1]:.1f} s | {turns / t1[1]:,.0f} | {fmt(t1)} |
   | local[4] | {len(t4)} | {t4[0]:.1f} s | {t4[1]:.1f} s | {turns / t4[1]:,.0f} | {fmt(t4)} |

   **Pre-registered estimator (symmetric second-minimum):
   ({t1[1]:.1f} / {t4[1]:.1f}) / 4 = x{t1[1] / t4[1]:.2f} / 4 = {eff:.3f} -> {verdict}
   (gate: >= 0.8).** Strict min-per-side (reported, not the gate):
   ({t1[0]:.1f} / {t4[0]:.1f}) / 4 = {strict:.3f}. Corpus {turns:,} turns (sf0.1),
   every rep a fresh cold-JVM bench.py, arms strictly interleaved."""
    bench = open(os.path.join(REPO, "BENCH.md")).read()
    assert "<!-- R6_GATE_RESULT -->" in bench
    open(os.path.join(REPO, "BENCH.md"), "w").write(
        bench.replace("<!-- R6_GATE_RESULT -->", block))
    print(json.dumps({"efficiency": round(eff, 3), "strict": round(strict, 3),
                      "n1": len(t1), "n4": len(t4), "verdict": verdict}))


if __name__ == "__main__":
    main()
