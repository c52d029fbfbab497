#!/usr/bin/env python
"""Decompose ER-bench wall time from Spark event logs: busy-core
timelines and per-stage task-CPU comparison between two runs.

Two uses behind BENCH/BASELINE.md:
- `--timeline` shows average busy cores per time bucket — evidence the
  DAG keeps the executor fed (no serial stage chain) at a given
  parallelism level.
- the two-run compare shows per-stage Executor CPU Time for identical
  logical work at two parallelism levels. This is how the un-pinned
  methodology was caught flattering the small leg: at free-floating
  local[2] the JVM burned ~40% LESS task CPU than at local[8] for the
  same stages because GC, Python workers, and shuffle threads ran on
  the 30 idle vCPUs — capacity an N-core executor container does not
  have. The headline measurement therefore cpuset-confines each leg
  (see scaling_bench.run_once).

Usage:
  SPARK_GRAFT_EVENTLOG=/tmp/spark-events SPARK_GRAFT_CPUS=2 \
      python bench.py --er-only     # produces eventlog_v2_local-<id>
  python scripts/stage_cpu_compare.py --timeline <appid>
  python scripts/stage_cpu_compare.py <appid_small> <appid_large>
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

EVENT_DIR = os.environ.get("SPARK_GRAFT_EVENTLOG", "/tmp/spark-events")


def load_events(appid: str) -> list[dict]:
    lines: list[str] = []
    pattern = os.path.join(EVENT_DIR, f"eventlog_v2_{appid}", "events_*")
    for p in sorted(glob.glob(pattern)):
        if p.endswith(".zstd"):
            out = subprocess.run(
                ["zstd", "-d", "-c", p], capture_output=True, text=True, check=True
            )
            lines += out.stdout.splitlines()
        else:
            with open(p) as f:
                lines += f.read().splitlines()
    events = []
    for line in lines:
        try:
            events.append(json.loads(line))
        except json.JSONDecodeError:
            continue
    return events


def timeline(appid: str, bucket_s: float = 5.0) -> None:
    """Average busy cores per bucket — utilization evidence."""
    tasks = [
        (e["Task Info"]["Launch Time"], e["Task Info"]["Finish Time"])
        for e in load_events(appid)
        if e.get("Event") == "SparkListenerTaskEnd"
    ]
    t0 = min(t[0] for t in tasks)
    t1 = max(t[1] for t in tasks)
    span = (t1 - t0) / 1000
    nb = int(span / bucket_s) + 1
    busy = [0.0] * nb
    for s, f in tasks:
        a, b = (s - t0) / 1000, (f - t0) / 1000
        for i in range(int(a / bucket_s), min(int(b / bucket_s) + 1, nb)):
            lo = i * bucket_s
            busy[i] += max(0.0, min(b, lo + bucket_s) - max(a, lo)) / bucket_s
    core_s = sum((f - s) for s, f in tasks) / 1000
    print(f"span={span:.0f}s total-task-core-s={core_s:.0f}")
    for i, v in enumerate(busy):
        print(f"t={i * bucket_s:5.0f}s busy={v:5.1f}")


def per_stage(appid: str) -> tuple[dict, dict]:
    stages: dict[int, dict] = {}
    names: dict[int, str] = {}
    for e in load_events(appid):
        if e.get("Event") == "SparkListenerTaskEnd":
            m = e.get("Task Metrics") or {}
            d = stages.setdefault(e["Stage ID"], {"cpu": 0.0, "n": 0})
            d["cpu"] += (m.get("Executor CPU Time", 0) or 0) / 1e9
            d["n"] += 1
        elif e.get("Event") == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            names[si["Stage ID"]] = si["Stage Name"][:48]
    return stages, names


def compare(appid_small: str, appid_large: str, top: int = 15) -> None:
    sa, na = per_stage(appid_small)
    sb, _ = per_stage(appid_large)
    cpu_a = sum(d["cpu"] for d in sa.values())
    cpu_b = sum(d["cpu"] for d in sb.values())
    print(
        f"total task-CPU: small={cpu_a:.0f}s large={cpu_b:.0f}s "
        f"inflation={cpu_b / cpu_a:.2f}x (same corpus, same logical work)"
    )
    print(f"top {top} stages of the small run by CPU, vs the large run's stage list:")
    # Stage IDs differ between runs; match by stage-name rank within name.
    by_name_a: dict[str, list[float]] = {}
    by_name_b: dict[str, list[float]] = {}
    for sid, d in sorted(sa.items()):
        by_name_a.setdefault(na.get(sid, "?"), []).append(d["cpu"])
    nb_names = per_stage(appid_large)[1]
    for sid, d in sorted(sb.items()):
        by_name_b.setdefault(nb_names.get(sid, "?"), []).append(d["cpu"])
    rows = []
    for name, cpus_a in by_name_a.items():
        cpus_b = by_name_b.get(name)
        if not cpus_b:
            continue
        a_sum, b_sum = sum(cpus_a), sum(cpus_b)
        if a_sum > 0.5:
            rows.append((a_sum, b_sum, name))
    for a_sum, b_sum, name in sorted(rows, reverse=True)[:top]:
        print(f"  cpu_small={a_sum:7.1f}s cpu_large={b_sum:7.1f}s x{b_sum / a_sum:4.2f}  {name}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--timeline" in sys.argv:
        timeline(args[0])
    else:
        compare(args[0], args[1])
