#!/usr/bin/env python
"""Exact 2-shingle Jaccard distribution of MISSED true hard pairs.

Classifies each missed pair by the first stage that dropped it
(not_candidate / prefilter_dropped / scored_rejected), then for a
sample of each class computes the EXACT token-2-shingle Jaccard
driver-side (diagnostic only — a few thousand pairs), so the recall
levers can be chosen from ground truth:

- J >= 0.2: banding probability is the binding constraint (more bands
  would catch them) or estimator noise dropped them at the prefilter
- J in [0.1, 0.2): below sig_prefilter — only a lower prefilter plus a
  scoring-side rescue can reach them
- J < 0.1: unreachable by shingle blocking at any sane setting (these
  should be orphan-like)

Usage: python scripts/hard_miss_jaccard.py
"""

from __future__ import annotations

import os
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def shingles(text: str, n: int = 2) -> set:
    toks = [t for t in "".join(c.lower() if c.isalnum() else " " for c in text).split() if t]
    return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_HARD_SCALE", "1.0")
    import bench
    from pyspark.sql import functions as F

    from bigdataentityresolution_spark.session import get_spark
    from bigdataentityresolution_spark.plans.pipeline import ERConfig, run_er_pipeline

    spark = get_spark(app_name="hard_miss_jaccard")
    files, truth, pairs = bench.ensure_hard_corpus(spark)
    files = files.cache()
    result = run_er_pipeline(spark, files, pairs, workdir=None, config=ERConfig())
    labels = result["labels"].cache()

    kind = F.regexp_extract("spec_id", r"src/(hard|orphan)", 1)
    t = truth.withColumn("kind", kind)
    true_pairs = (
        t.select(F.col("spec_id").alias("a"), "cluster_id", "kind")
        .join(t.select(F.col("spec_id").alias("b"), "cluster_id"), "cluster_id")
        .filter((F.col("a") < F.col("b")) & (F.col("kind") == "hard"))
        .select("a", "b")
    )
    pred_pairs = (
        labels.select(F.col("spec_id").alias("a"), "cluster_id")
        .join(labels.select(F.col("spec_id").alias("b"), "cluster_id"), "cluster_id")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    missed = true_pairs.join(pred_pairs, ["a", "b"], "left_anti")
    # candidates_all (r5+): both channels — attributing against the
    # lexical channel alone would mislabel semantic-channel candidates
    # as not_candidate
    cand = result["candidates_all"].select(
        F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"), F.lit(1).alias("is_cand")
    )
    scored = result["scored"].select(
        F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"), "proba"
    )
    staged = (
        missed.join(cand, ["a", "b"], "left")
        .join(scored, ["a", "b"], "left")
        .withColumn(
            "stage",
            F.when(F.col("is_cand").isNull(), "not_candidate")
            .when(F.col("proba").isNull(), "prefilter_dropped")
            .otherwise("scored_rejected"),
        )
        .select("a", "b", "stage")
    ).cache()
    staged.groupBy("stage").count().show(10, False)

    sample = staged.limit(4000).collect()
    ids = sorted({r["a"] for r in sample} | {r["b"] for r in sample})
    content = {
        r["spec_id"]: r["content"]
        for r in files.filter(F.col("spec_id").isin(ids)).select("spec_id", "content").collect()
    }
    hist: dict[str, Counter] = {}
    for r in sample:
        sa, sb = shingles(content[r["a"]]), shingles(content[r["b"]])
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter) if (sa or sb) else 0.0
        bucket = f"{int(j * 20) * 5 / 100:.2f}"
        hist.setdefault(r["stage"], Counter())[bucket] += 1
    for stage in sorted(hist):
        total = sum(hist[stage].values())
        print(f"\n== exact-J histogram: {stage} (n={total}) ==")
        for b in sorted(hist[stage]):
            n = hist[stage][b]
            print(f"  J~{b}: {n:5d}  {'#' * int(60 * n / total)}")

    result["runner"].release()
    spark.stop()


if __name__ == "__main__":
    main()
