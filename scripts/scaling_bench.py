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


N_SMALL = int(os.environ.get("SPARK_GRAFT_SCALING_N", "8"))
N_LARGE = int(os.environ.get("SPARK_GRAFT_SCALING_4N", str(4 * N_SMALL)))


def main() -> None:
    r_small = run(N_SMALL)
    r_large = run(N_LARGE)
    ratio = N_LARGE / N_SMALL

    t_small, t_large = r_small["er"]["sec"], r_large["er"]["sec"]
    eff = (t_small / t_large) / ratio
    report = {
        "n_cores_small": N_SMALL,
        "n_cores_large": N_LARGE,
        f"t_local{N_SMALL}_sec": round(t_small, 2),
        f"t_local{N_LARGE}_sec": round(t_large, 2),
        f"pairs_per_sec_local{N_SMALL}": round(r_small["er"]["candidate_pairs_per_sec"], 1),
        f"pairs_per_sec_local{N_LARGE}": round(r_large["er"]["candidate_pairs_per_sec"], 1),
        "speedup": round(t_small / t_large, 3),
        "scaling_efficiency": round(eff, 3),
        "n_files": r_small["er"]["n_files"],
        "n_candidates": r_small["er"]["n_candidates"],
        "f1": r_small["er"]["f1"],
    }
    print(json.dumps(report))

    md = REPO / "BENCH" / "BASELINE.md"
    md.parent.mkdir(exist_ok=True)
    lines = [
        "# BENCH/BASELINE — measured scaling evidence",
        "",
        "Same ER job (`bench.py --er-only`, deterministic synthetic source-code",
        f"corpus, {report['n_files']} files, {report['n_candidates']} candidate pairs,",
        f"pairwise F1 = {report['f1']}) at two parallelism levels (N and 4N cores),",
        f"min of {REPS} fresh-JVM runs each:",
        "",
        "| parallelism | wall sec | candidate-pairs/sec |",
        "|---|---|---|",
        f"| local[{N_SMALL}]  | {report[f't_local{N_SMALL}_sec']} | {report[f'pairs_per_sec_local{N_SMALL}']} |",
        f"| local[{N_LARGE}] | {report[f't_local{N_LARGE}_sec']} | {report[f'pairs_per_sec_local{N_LARGE}']} |",
        "",
        f"speedup (T{N_SMALL}/T{N_LARGE}) = **{report['speedup']}×** over a {int(ratio)}× core increase",
        f"→ scaling efficiency = (T{N_SMALL}/T{N_LARGE})/{int(ratio)} = **{report['scaling_efficiency']}**"
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
