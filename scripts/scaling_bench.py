#!/usr/bin/env python
"""Scaling-efficiency evidence: the same ER job at local[8] vs local[32].

BASELINE.json north_rule requires ≥0.8 throughput scaling efficiency
between N- and 4N-executor clusters; in this sandbox (no real cluster)
the driver instructions say to evidence it by running the identical job
at two parallelism levels on the same input.

Runs `bench.py --er-only` in fresh subprocesses (fresh JVM each — no
warm-cache bleed) with SPARK_GRAFT_CPUS=8 then 32, and appends the
measured table to BENCH/BASELINE.md.

efficiency = (T_8 / T_32) / 4   (1.0 = perfect linear scaling)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


REPS = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "2"))


def run_once(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--er-only"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def run(cpus: int) -> dict:
    """Best of REPS fresh-JVM runs — JIT/GC warm-up noise on a virtualized
    host swings single runs by 2x; min-of-N is the stable estimator."""
    best = None
    for i in range(REPS):
        r = run_once(cpus)
        print(json.dumps({"cpus": cpus, "rep": i, **r["er"]}))
        if best is None or r["er"]["sec"] < best["er"]["sec"]:
            best = r
    return best


def main() -> None:
    r8 = run(8)
    r32 = run(32)

    t8, t32 = r8["er"]["sec"], r32["er"]["sec"]
    eff = (t8 / t32) / 4
    report = {
        "t_local8_sec": round(t8, 2),
        "t_local32_sec": round(t32, 2),
        "pairs_per_sec_local8": round(r8["er"]["candidate_pairs_per_sec"], 1),
        "pairs_per_sec_local32": round(r32["er"]["candidate_pairs_per_sec"], 1),
        "speedup": round(t8 / t32, 3),
        "scaling_efficiency": round(eff, 3),
        "n_files": r8["er"]["n_files"],
        "n_candidates": r8["er"]["n_candidates"],
        "f1": r8["er"]["f1"],
    }
    print(json.dumps(report))

    md = REPO / "BENCH" / "BASELINE.md"
    md.parent.mkdir(exist_ok=True)
    lines = [
        "# BENCH/BASELINE — measured scaling evidence",
        "",
        "Same ER job (`bench.py --er-only`, deterministic synthetic source-code",
        f"corpus, {report['n_files']} files, {report['n_candidates']} candidate pairs,",
        f"pairwise F1 = {report['f1']}) at two parallelism levels, fresh JVM each:",
        "",
        "| parallelism | wall sec | candidate-pairs/sec |",
        "|---|---|---|",
        f"| local[8]  | {report['t_local8_sec']} | {report['pairs_per_sec_local8']} |",
        f"| local[32] | {report['t_local32_sec']} | {report['pairs_per_sec_local32']} |",
        "",
        f"speedup (T8/T32) = **{report['speedup']}×** over a 4× core increase",
        f"→ scaling efficiency = (T8/T32)/4 = **{report['scaling_efficiency']}**"
        + (" (meets the ≥0.8 north-rule bar)" if eff >= 0.8 else " (below the 0.8 bar — see notes)"),
        "",
        "```json",
        json.dumps(report, indent=2),
        "```",
        "",
    ]
    md.write_text("\n".join(lines))
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
