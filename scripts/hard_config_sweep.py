#!/usr/bin/env python
"""Sweep edge-decision configs on the HARD tier at reduced scale and
print P/R/F1 per config — measures the precision cost of each recall
lever before committing to it.

Usage: SPARK_GRAFT_HARD_SCALE=0.2 python scripts/hard_config_sweep.py
"""
from __future__ import annotations

import os
import sys
import time
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_HARD_SCALE", "0.2")

import bench  # noqa: E402
from bigdataentityresolution_spark.plans.pipeline import (  # noqa: E402
    ERConfig,
    labeled_pair_f1,
    pairwise_f1,
    run_er_pipeline,
)
from bigdataentityresolution_spark.session import get_spark  # noqa: E402

CONFIGS = {
    "baseline": ERConfig(),
    "override_0.95": ERConfig(edge_high_conf_override=0.95),
    "ovr_jacc_0.25": ERConfig(edge_override_jaccard_min=0.25),
    "ovr_0.95+jacc_0.25": ERConfig(
        edge_high_conf_override=0.95, edge_override_jaccard_min=0.25
    ),
    "ovr_0.95+jacc_0.20": ERConfig(
        edge_high_conf_override=0.95, edge_override_jaccard_min=0.20
    ),
}


def main() -> None:
    spark = get_spark()
    files, truth, pairs = bench.ensure_hard_corpus(spark)
    files = files.cache()
    files.count()
    for name, cfg in CONFIGS.items():
        t0 = time.time()
        result = run_er_pipeline(spark, files, pairs, workdir=None, config=cfg)
        m = pairwise_f1(result["labels"], truth)
        lm = labeled_pair_f1(result["labels"], pairs)
        wall = time.time() - t0
        print(
            f"{name:>22}: P={m['precision']:.4f} R={m['recall']:.4f} "
            f"F1={m['f1']:.4f} labeledF1={lm['f1']:.4f} "
            f"thr={result['edge_threshold']:.3f} wall={wall:.1f}s"
        )
        result["runner"].release()
        spark.catalog.clearCache()
        files = files.cache()
        files.count()


if __name__ == "__main__":
    main()
