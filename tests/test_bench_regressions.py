"""Round-over-round regression check coverage (VERDICT r4 #3).

The bench's _regressions compares THIS run's per-query walls against the
latest committed BENCH_r{N}.json. r4's gap: the new quality benches
(er_hard, hotkey_*) were in the queries dict but nothing asserted the
check would actually WARN if they slipped — these tests pin that with a
synthetic prior, no Spark session needed.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def test_regressions_flags_er_hard_and_hotkey_slips(monkeypatch):
    prior = {
        "er_pipeline": 30.0,
        "er_pipeline_noselftrain": 25.0,
        "er_hard": 80.0,
        "hotkey_capped": 4.0,
        "hotkey_salted": 3.5,
        "tfidf_flagship": 2.0,
    }
    monkeypatch.setattr(bench, "_prior_round_queries", lambda: prior)
    now = dict(prior)
    now["er_hard"] = 80.0 * 1.4  # 1.4x slip: must WARN at threshold 1.3
    now["hotkey_capped"] = 4.0 * 2.0
    out = bench._regressions(now, threshold=1.3)
    assert set(out) == {"er_hard", "hotkey_capped"}
    assert out["er_hard"]["ratio"] == 1.4
    assert out["hotkey_capped"]["prev"] == 4.0


def test_regressions_quiet_below_threshold(monkeypatch):
    prior = {"er_hard": 80.0, "hotkey_salted": 3.5}
    monkeypatch.setattr(bench, "_prior_round_queries", lambda: prior)
    now = {"er_hard": 80.0 * 1.25, "hotkey_salted": 3.4}
    assert bench._regressions(now, threshold=1.3) == {}


def test_regressions_new_key_without_prior_is_not_flagged(monkeypatch):
    monkeypatch.setattr(bench, "_prior_round_queries", lambda: {"er_hard": 80.0})
    out = bench._regressions({"er_hard": 81.0, "brand_new_bench": 100.0})
    assert out == {}


def test_latest_committed_bench_carries_quality_keys():
    """The committed BENCH history must keep exposing er_hard/hotkey walls,
    else the generic key-matching comparison silently loses them."""
    prior = bench._prior_round_queries()
    assert {"er_hard", "hotkey_capped", "hotkey_salted"} <= set(prior), (
        f"latest BENCH_r*.json queries missing quality keys: {sorted(prior)}"
    )
