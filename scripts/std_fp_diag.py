#!/usr/bin/env python
"""Diagnose the STANDARD-tier F1 regression introduced by the calibrated
override bar (post-7064251 bench measured f1 0.985, clusters 23924 <
24000 -> over-merge).

Runs the standard bench corpus at reduced scale, prints the calibrated
bar, pairwise P/R/F1, and decomposes the predicted FALSE-POSITIVE edges
by acceptance channel: strict floors vs the high-confidence override,
with proba / f_jaccard / f_cosine histograms of the FP override edges.

Usage: python scripts/std_fp_diag.py [n_clusters n_unrelated]
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bigdataentityresolution_spark.operators import scoring as S  # noqa: E402
from bigdataentityresolution_spark.plans.pipeline import (  # noqa: E402
    ERConfig,
    pairwise_f1,
    run_er_pipeline,
)
from bigdataentityresolution_spark.session import get_spark  # noqa: E402
from bigdataentityresolution_spark.sources.synthetic import (  # noqa: E402
    corpus_to_spark,
    generate_corpus,
)


def main():
    if len(sys.argv) > 1 and sys.argv[1].startswith("/"):
        # path to a materialized bench corpus (files/ truth/ pairs/)
        spark = get_spark(app_name="std_fp_diag", shuffle_partitions=32)
        base = sys.argv[1]
        files = spark.read.parquet(f"{base}/files")
        truth = spark.read.parquet(f"{base}/truth")
        pairs = spark.read.parquet(f"{base}/pairs")
    else:
        n_clusters = int(sys.argv[1]) if len(sys.argv) > 1 else 800
        n_unrelated = int(sys.argv[2]) if len(sys.argv) > 2 else 1600
        spark = get_spark(app_name="std_fp_diag", shuffle_partitions=16)
        corpus = generate_corpus(
            n_clusters=n_clusters, n_unrelated=n_unrelated, n_repos=100, seed=42
        )
        files, truth, pairs = corpus_to_spark(spark, corpus)
    files = files.cache()
    cfg = ERConfig()
    result = run_er_pipeline(spark, files, pairs, workdir=None, config=cfg)
    m = pairwise_f1(result["labels"], truth)
    print(
        f"n_files={files.count()} bar={result['override_bar']} thr={result['edge_threshold']}"
    )
    print({k: (round(v, 4) if isinstance(v, float) else v) for k, v in m.items()})

    # Calibration evidence: how many labeled negatives pass the relaxed
    # floors, and what do they score? (calibrate_override_bar's input)
    tp_rel = S.predict(
        result["train_pairs"].select("label", *S.FEATURE_COLS), result["model"]
    ).filter(
        (F.col("f_jaccard") >= F.lit(cfg.edge_override_jaccard_min))
        & (
            (F.col("f_cosine") >= F.lit(cfg.edge_override_cosine_min))
            | (F.col("f_cosine") == 0)
        )
    )
    ev = tp_rel.groupBy("label").agg(
        F.count("*").alias("n"), F.max("proba").alias("max_proba"),
        F.expr("percentile_approx(proba, 0.99)").alias("p99"),
    ).orderBy("label").collect()
    print("calibration evidence (labeled pairs passing relaxed floors):",
          [dict(r.asDict()) for r in ev])

    # Rebuild the edge decision exactly as run_er_pipeline.final_cluster
    # does, tag each accepted edge with its channel, and join truth to
    # find the FPs.
    scored = result["scored"]
    thr = result["edge_threshold"]
    bar = result["override_bar"]
    floor_ok = (F.col("f_cosine") >= F.lit(cfg.edge_cosine_floor)) | (
        F.col("f_cosine") == 0
    )
    floor_ok = floor_ok & (F.col("f_jaccard") >= F.lit(cfg.edge_jaccard_floor))
    relaxed_ok = (F.col("f_jaccard") >= F.lit(cfg.edge_override_jaccard_min)) & (
        (F.col("f_cosine") >= F.lit(cfg.edge_override_cosine_min))
        | (F.col("f_cosine") == 0)
    )
    edges = (
        scored.filter(F.col("proba") >= F.lit(thr))
        .withColumn("ch_floor", floor_ok)
        .withColumn(
            "ch_override",
            relaxed_ok & (F.col("proba") >= F.lit(float(bar))) if bar is not None else F.lit(False),
        )
        .filter(F.col("ch_floor") | F.col("ch_override"))
    )
    t = truth.select(
        F.col("spec_id").alias("a_id"), F.col("cluster_id").alias("a_cl")
    )
    t2 = truth.select(
        F.col("spec_id").alias("b_id"), F.col("cluster_id").alias("b_cl")
    )
    tagged = (
        edges.join(t, edges["a"] == t["a_id"])
        .join(t2, edges["b"] == t2["b_id"])
        .withColumn("is_fp", F.col("a_cl") != F.col("b_cl"))
    )
    agg = tagged.groupBy("is_fp", "ch_floor", "ch_override").count().collect()
    for r in sorted(agg, key=lambda r: (r["is_fp"], r["ch_floor"])):
        print(dict(r.asDict()))
    for fp_side in (True, False):
        h = (
            tagged.filter(
                (F.col("is_fp") == fp_side) & F.col("ch_override") & ~F.col("ch_floor")
            )
            .groupBy(F.floor(F.col("proba") * 20).alias("bin20"))
            .count()
            .orderBy("bin20")
            .collect()
        )
        print(
            f"proba histogram (override-only, is_fp={fp_side}):",
            [(r["bin20"] / 20.0, r["count"]) for r in h],
        )
    fps = tagged.filter("is_fp AND ch_override AND NOT ch_floor")
    stats = fps.select(
        F.min("proba"), F.max("proba"), F.avg("proba"),
        F.min("f_jaccard"), F.max("f_jaccard"),
        F.min("f_cosine"), F.max("f_cosine"), F.count("*"),
    ).collect()
    print("FP override-only edges:", stats)
    fps.select("a", "b", "proba", "f_jaccard", "f_cosine", "f_lev").show(
        20, truncate=False
    )
    spark.stop()


if __name__ == "__main__":
    main()
