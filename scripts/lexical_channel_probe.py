#!/usr/bin/env python
"""Pre-implementation measurement for the lexical (unigram) blocking
channel: would the trained model's proba, gated at the calibrated
override bar, separate (a) blocked-out TRUE clone pairs the 2-shingle
channel misses from (b) template-group NON-clone pairs a unigram
channel would also surface?

Prints, for both populations restricted to unigram-J >= admission:
proba / cosine / unigram-J distributions and the confusion counts at
the current override bar. This decides whether the lexical acceptance
path gates on model proba, exact cosine, or both — measured, not
guessed.

Usage: SPARK_GRAFT_HARD_SCALE=0.2 python scripts/lexical_channel_probe.py
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
from bigdataentityresolution_spark.operators import scoring as S  # noqa: E402
from bigdataentityresolution_spark.plans.pipeline import (  # noqa: E402
    ERConfig,
    run_er_pipeline,
)
from bigdataentityresolution_spark.session import get_spark  # noqa: E402

ADMIT_J1 = 0.40


def norm_pairs(df, a, b):
    return df.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b")).distinct()


def with_exact_j(files, pairs, n, out_col):
    sh = files.select(
        "spec_id", F.array_distinct(shingles(tokenize("content"), n)).alias("sh")
    )
    return (
        pairs.join(
            sh.select(F.col("spec_id").alias("a"), F.col("sh").alias("sh_a")), "a"
        )
        .join(sh.select(F.col("spec_id").alias("b"), F.col("sh").alias("sh_b")), "b")
        .withColumn(
            out_col,
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
        )
        .drop("sh_a", "sh_b")
    )


def describe(df, name):
    df.select(
        F.count("*").alias("n"),
        F.round(F.min("proba"), 3).alias("p_min"),
        F.round(F.expr("percentile(proba, 0.25)"), 3).alias("p_q1"),
        F.round(F.expr("percentile(proba, 0.5)"), 3).alias("p_med"),
        F.round(F.expr("percentile(proba, 0.75)"), 3).alias("p_q3"),
        F.round(F.max("proba"), 3).alias("p_max"),
        F.round(F.expr("percentile(f_cosine, 0.5)"), 3).alias("cos_med"),
        F.round(F.max("f_cosine"), 3).alias("cos_max"),
        F.round(F.expr("percentile(j1, 0.5)"), 3).alias("j1_med"),
    ).show(truncate=False)
    print(f"  {name}: proba >= 0.8 count:", df.where(F.col("proba") >= 0.8).count())
    print(
        f"  {name}: proba >= 0.8 & cosine >= 0.35:",
        df.where((F.col("proba") >= 0.8) & (F.col("f_cosine") >= 0.35)).count(),
    )


def main() -> None:
    spark = get_spark()
    files, truth, pairs = bench.ensure_hard_corpus(spark)
    files = files.cache()
    cfg = ERConfig()
    result = run_er_pipeline(spark, files, pairs, workdir=None, config=cfg)
    model = result["model"]
    print("override bar:", result["override_bar"])

    t = truth.select("spec_id", "cluster_id")
    true_pairs = (
        t.alias("x")
        .join(t.alias("y"), F.col("x.cluster_id") == F.col("y.cluster_id"))
        .where(F.col("x.spec_id") < F.col("y.spec_id"))
        .select(F.col("x.spec_id").alias("a"), F.col("y.spec_id").alias("b"))
    ).cache()
    pred = norm_pairs(
        result["labels"].alias("x").join(
            result["labels"].alias("y"),
            F.col("x.cluster_id") == F.col("y.cluster_id"),
        ).where(F.col("x.spec_id") < F.col("y.spec_id")).select(
            F.col("x.spec_id").alias("a"), F.col("y.spec_id").alias("b")
        ),
        "a",
        "b",
    )
    cands = norm_pairs(result["candidates"], "a", "b")
    missed = true_pairs.join(pred, ["a", "b"], "left_anti")
    blocked_out = (
        missed.join(cands, ["a", "b"], "left_anti")
        .where(~F.col("a").contains("/orphan_") & ~F.col("b").contains("/orphan_"))
        .cache()
    )

    # template non-clone pairs: same template group (path prefix before
    # the file index), distinct entities by construction. Sample the hot
    # block to keep the probe small.
    tmpl = files.where(F.col("path").contains("/tmpl_")).select(
        "spec_id",
        F.regexp_extract("path", r"(tmpl_\d+(_hot)?)", 1).alias("grp"),
    )
    tmpl_pairs = (
        tmpl.alias("x")
        .join(tmpl.alias("y"), F.col("x.grp") == F.col("y.grp"))
        .where(F.col("x.spec_id") < F.col("y.spec_id"))
        .select(
            F.col("x.spec_id").alias("a"),
            F.col("y.spec_id").alias("b"),
            F.col("x.grp").alias("grp"),
        )
    )
    hot = tmpl_pairs.where(F.col("grp").contains("_hot")).limit(2000)
    nonhot = tmpl_pairs.where(~F.col("grp").contains("_hot"))
    tmpl_sample = hot.unionByName(nonhot).drop("grp").cache()

    docs_prep = result["docs_prep"]

    def featurized(p):
        q = with_exact_j(files, p, 1, "j1").where(F.col("j1") >= ADMIT_J1)
        q = with_exact_j(files, q, 2, "j2").withColumnRenamed("j2", "est_j")
        feats = S.pair_features_from_est(
            q.select("a", "b", "est_j", "j1"), docs_prep,
            lev_bound=cfg.lev_bound, sig_prefilter=None,
        )
        return S.predict(feats, model)

    print("=== blocked-out TRUE pairs admitted at unigram J >=", ADMIT_J1, "===")
    b = featurized(blocked_out).cache()
    describe(b, "true")
    print("admitted / blocked-out total:", b.count(), "/", blocked_out.count())

    print("=== template NON-clone pairs admitted at unigram J >=", ADMIT_J1, "===")
    n = featurized(tmpl_sample).cache()
    describe(n, "neg")
    print("admitted / sampled total:", n.count(), "/", tmpl_sample.count())
    # unique-header groups are the LOW group indices (g < n_unique_header_groups
    # in generate_hard_corpus) — the genuinely hard precision case
    n_uniq = int(200 * float(os.environ.get("SPARK_GRAFT_HARD_SCALE", "1")))
    uniq = n.where(F.regexp_extract("a", r"tmpl_(\d+)", 1).cast("int") < n_uniq)
    print("=== of those, UNIQUE-header (rare-token) non-clones ===")
    describe(uniq, "uniq-neg")
    result["runner"].release()


if __name__ == "__main__":
    main()
