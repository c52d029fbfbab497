#!/usr/bin/env python
"""Summarize a scaling_bench.py log: per-pair efficiency distribution plus
the session-min estimator.

Session-min: on a shared KVM host, contention is ONE-SIDED noise — it
only ever ADDS wall time (the job's work is fixed), so min(t_leg) over
all fresh launches is the tightest observed upper bound on that ONE
leg's uncontended wall. The RATIO min_small/min_large, however, divides
two mins usually taken in DIFFERENT time windows, so it is neither an
upper nor a lower bound on the true efficiency — it can overstate it
when the large leg happened to catch the session's one quiet window
(ADVICE r3). Treat it as a heuristic point estimate (a ratio of two
per-leg bounds); the per-pair MEDIAN is the headline, and per-pair
quiet-window readings (probes quiet before AND after the legs) are the
direct evidence.

Usage: python scripts/scaling_summary.py /tmp/scaling_r3.log
"""

from __future__ import annotations

import json
import sys


def main(path: str) -> dict:
    pairs = []
    legs: dict[int, list[float]] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "pair" in obj and "efficiency" in obj:
                pairs.append(obj)
            elif "cpus" in obj and "sec" in obj:
                legs.setdefault(obj["cpus"], []).append(float(obj["sec"]))
                # every in-JVM rep is a valid observation of the leg's
                # wall under whatever contention that window had
                for s in obj.get("rep_secs") or []:
                    legs[obj["cpus"]].append(float(s))

    if not pairs or len(legs) != 2:
        raise SystemExit(f"no complete pairs in {path}")

    n_small, n_large = sorted(legs)
    ratio = n_large / n_small
    effs = sorted(p["efficiency"] for p in pairs)
    n = len(effs)
    med = effs[n // 2] if n % 2 else (effs[n // 2 - 1] + effs[n // 2]) / 2
    min_small = min(legs[n_small])
    min_large = min(legs[n_large])
    quiet = sorted(
        p["efficiency"] for p in pairs if p.get("quiet_window")
    )
    out = {
        "pairs_n": n,
        "efficiency_per_pair": effs,
        "efficiency_median": round(med, 3),
        # pairs whose hw probes read quiet BOTH before and after the legs
        # (only recorded by r4+ sessions run with SPARK_GRAFT_QUIET_MIN)
        "quiet_window_pairs": quiet,
        f"t{n_small}_all": sorted(legs[n_small]),
        f"t{n_large}_all": sorted(legs[n_large]),
        f"t{n_small}_min": min_small,
        f"t{n_large}_min": min_large,
        "efficiency_session_min": round((min_small / min_large) / ratio, 3),
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_r3.log")
