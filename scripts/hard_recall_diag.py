#!/usr/bin/env python
"""Diagnose WHERE the hard-tier recall loss happens: blocking (true pair
never became a candidate), prefilter, scoring (candidate but edge not
accepted), or clustering. Runs at a reduced SPARK_GRAFT_HARD_SCALE so it
iterates in seconds; the loss decomposition, not the absolute wall, is
the point.

Two layers of attribution:

1. candidate-level: true pairs that never became candidates (blocking
   loss) vs candidates the edge decision rejected (scoring loss), with
   orphan (by-construction unreachable) pairs separated out.
2. gate-level: scoring losses are bucketed by WHICH gate rejected them
   (model proba below threshold / floors reject / override near-miss),
   and blocking losses get their exact 2-shingle AND unigram-token
   Jaccard histograms — which tells whether a second, coarser LSH
   granularity would recover them (unigram Jaccard survives the body
   rewrites + renames that destroy 2-shingle Jaccard).

Usage: SPARK_GRAFT_HARD_SCALE=0.2 python scripts/hard_recall_diag.py
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_HARD_SCALE", "0.2")

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from bigdataentityresolution_spark.functions.text import shingles, tokenize  # noqa: E402
from bigdataentityresolution_spark.plans.pipeline import (  # noqa: E402
    ERConfig,
    pairwise_f1,
    run_er_pipeline,
)
from bigdataentityresolution_spark.session import get_spark  # noqa: E402


def norm_pairs(df, a, b):
    return df.select(
        F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
    ).distinct()


def exact_jaccard(files, pairs, n: int, out_col: str):
    """Exact n-gram-shingle Jaccard for the (a, b) pairs in ``pairs``.

    Diagnostic-only plan (fine for a few-thousand-pair missed set): the
    shingle sets ride a join keyed on spec_id, then one agg per pair.
    """
    sh = files.select(
        F.col("spec_id"),
        F.array_distinct(shingles(tokenize("content"), n)).alias("sh"),
    )
    j = (
        pairs.join(sh.withColumnRenamed("spec_id", "a").withColumnRenamed("sh", "sh_a"), "a")
        .join(sh.withColumnRenamed("spec_id", "b").withColumnRenamed("sh", "sh_b"), "b")
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1))
            ).alias(out_col),
        )
    )
    return j


def hist(df, col, edges):
    """Print a tiny text histogram of ``col`` over the bin ``edges``."""
    rows = df.select(
        F.when(F.col(col) < edges[0], f"<{edges[0]}")
        .otherwise(
            F.concat(
                F.lit("["),
                F.format_number(
                    F.floor(F.col(col) / 0.05) * 0.05, 2
                ),
                F.lit(")"),
            )
        )
        .alias("bin")
    ).groupBy("bin").count().orderBy("bin").collect()
    for r in rows:
        print(f"    {r['bin']:>8}: {r['count']}")


def main() -> None:
    spark = get_spark()
    files, truth, pairs = bench.ensure_hard_corpus(spark)
    files = files.cache()
    cfg = ERConfig()
    result = run_er_pipeline(spark, files, pairs, workdir=None, config=cfg)
    thr = float(result["edge_threshold"])
    # resolved (calibrated) override bar — cfg may hold the sentinel "auto"
    override_bar = float(result["override_bar"])

    # true pairs from the truth labeling (within-cluster pairs)
    t = truth.select("spec_id", "cluster_id")
    true_pairs = (
        t.alias("x")
        .join(t.alias("y"), F.col("x.cluster_id") == F.col("y.cluster_id"))
        .where(F.col("x.spec_id") < F.col("y.spec_id"))
        .select(F.col("x.spec_id").alias("a"), F.col("y.spec_id").alias("b"))
    ).cache()
    n_true = true_pairs.count()

    # orphan pairs (by-construction unreachable) — spec_id prefix carries the kind
    orphan_true = true_pairs.where(
        F.col("a").contains("/orphan_") | F.col("b").contains("/orphan_")
    )
    n_orphan = orphan_true.count()

    cands = norm_pairs(result["candidates"], "a", "b").cache()
    cand_hit = true_pairs.join(cands, ["a", "b"], "left_semi").count()

    pred = norm_pairs(
        result["labels"].alias("x").join(
            result["labels"].alias("y"),
            F.col("x.cluster_id") == F.col("y.cluster_id"),
        ).where(F.col("x.spec_id") < F.col("y.spec_id")).select(
            F.col("x.spec_id").alias("a"), F.col("y.spec_id").alias("b")
        ),
        "a",
        "b",
    ).cache()
    m = pairwise_f1(result["labels"], truth)

    missed = true_pairs.join(pred, ["a", "b"], "left_anti").cache()
    missed_total = missed.count()
    missed_orphan = missed.where(
        F.col("a").contains("/orphan_") | F.col("b").contains("/orphan_")
    ).count()

    non_orphan_missed = missed.join(orphan_true, ["a", "b"], "left_anti").cache()
    nm = non_orphan_missed.count()
    nm_cand = non_orphan_missed.join(cands, ["a", "b"], "left_semi").count()

    print("n_true_pairs      :", n_true)
    print("  orphan (unreachable by construction):", n_orphan)
    print("candidate recall  :", round(cand_hit / n_true, 4), f"({cand_hit}/{n_true})")
    print("pairwise P/R/F1   :", m["precision"], m["recall"], m["f1"])
    print("edge threshold    :", round(thr, 4))
    print("missed pairs      :", missed_total, "| orphan:", missed_orphan)
    print("non-orphan missed :", nm, "| were candidates:", nm_cand, "| blocked out:", nm - nm_cand)

    # ---- gate-level attribution of the SCORING losses -------------------
    scored = norm_pairs(result["scored"], "a", "b").join(
        result["scored"].select(
            F.least("a", "b").alias("a"),
            F.greatest("a", "b").alias("b"),
            "proba",
            "f_cosine",
            "f_jaccard",
            "f_vocab_cov",
        ),
        ["a", "b"],
    )
    sm = non_orphan_missed.join(scored, ["a", "b"]).cache()
    floor_ok = (
        (F.col("f_cosine") >= F.lit(cfg.edge_cosine_floor)) | (F.col("f_vocab_cov") == 0)
    ) & (F.col("f_jaccard") >= F.lit(cfg.edge_jaccard_floor))
    relaxed_ok = (F.col("f_jaccard") >= F.lit(cfg.edge_override_jaccard_min)) & (
        (F.col("f_cosine") >= F.lit(cfg.edge_override_cosine_min))
        | (F.col("f_vocab_cov") == 0)
    )
    buckets = sm.select(
        F.when(F.col("proba") < thr, "proba_below_thr")
        .when(floor_ok, "accepted?!")  # should be empty — accepted but unmerged
        .when(
            relaxed_ok & (F.col("proba") >= override_bar),
            "accepted_override?!",
        )
        .when(relaxed_ok, "override_proba_short")  # relaxed floors ok, proba in [thr, bar)
        .when(F.col("f_jaccard") < cfg.edge_override_jaccard_min, "below_jaccard_override_min")
        .otherwise("below_cosine_override_min")
        .alias("gate")
    ).groupBy("gate").count().orderBy(F.desc("count")).collect()
    print("scoring-loss gates (non-orphan missed ∩ scored):")
    for r in buckets:
        print(f"    {r['gate']:>28}: {r['count']}")
    print("  proba distribution of scoring losses:")
    sm.select(
        F.min("proba"), F.expr("percentile(proba, 0.25)"), F.expr("percentile(proba, 0.5)"),
        F.expr("percentile(proba, 0.75)"), F.max("proba"),
    ).show(truncate=False)
    print("  f_jaccard (est) distribution of scoring losses:")
    hist(sm, "f_jaccard", [0.1])

    # ---- blocking losses: would a coarser granularity recover them? -----
    blocked_out = non_orphan_missed.join(cands, ["a", "b"], "left_anti").cache()
    j2 = exact_jaccard(files, blocked_out, 2, "j2")
    j1 = exact_jaccard(files, blocked_out, 1, "j1")
    both = j2.join(j1, ["a", "b"]).cache()
    print("blocked-out pairs: exact 2-shingle Jaccard:")
    hist(both, "j2", [0.1])
    print("blocked-out pairs: exact unigram-token Jaccard:")
    hist(both, "j1", [0.1])
    print(
        "blocked-out with unigram J >= 0.45 (coarse-LSH recoverable):",
        both.where(F.col("j1") >= 0.45).count(),
        "/",
        both.count(),
    )
    result["runner"].release()


if __name__ == "__main__":
    main()
