#!/usr/bin/env python
"""Per-stage wall-time profile of the ER pipeline at a given core count.

Usage: SPARK_GRAFT_CPUS=8 python scripts/profile_stages.py
Prints one JSON line of stage timings — used to find the serial fraction
that caps scaling efficiency. Mirrors plans/pipeline.py's compact flow.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CORPUS = os.environ.get("SPARK_GRAFT_BENCH_CORPUS", "/tmp/bench_corpus_c8000_u16000")


def main() -> None:
    from pyspark.sql import functions as F

    from bigdataentityresolution_spark.functions.text import tokenize
    from bigdataentityresolution_spark.operators import blocking as B
    from bigdataentityresolution_spark.operators import clustering as C
    from bigdataentityresolution_spark.operators import scoring as S
    from bigdataentityresolution_spark.operators import tfidf as TI
    from bigdataentityresolution_spark.session import get_spark

    spark = get_spark(app_name=f"profile{CPUS}", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    files = spark.read.parquet(f"{CORPUS}/files").cache()
    pairs = spark.read.parquet(f"{CORPUS}/pairs").cache()
    files.count()
    pairs.count()

    tok = tokenize("content")
    t: dict[str, float] = {}

    t0 = time.time()
    sigs = B.minhash_signatures_df(files, id_col="spec_id", text_col="content", tokenizer=tok).cache()
    sigs.count()
    t["signatures"] = time.time() - t0

    t0 = time.time()
    n_docs = files.count()
    p = TI.postings(files, id_col="spec_id", text_col="content", tokenizer=tok)
    v = TI.vocab(p, n_docs)
    top = TI.top_k_vocab(v, 1000)
    vecs = TI.doc_vectors_indexed(p, top, n_docs).withColumnRenamed("doc_id", "spec_id")
    prep = (
        files.select("spec_id", F.substring("content", 1, 128).alias("prefix"))
        .join(vecs, "spec_id", "left")
        .withColumn("features", F.coalesce("features", F.map_from_arrays(F.array().cast("array<int>"), F.array().cast("array<float>"))))
        .join(sigs, "spec_id")
        .cache()
    )
    prep.count()
    t["prep"] = time.time() - t0

    t0 = time.time()
    mem = B.membership_from_signatures(sigs).cache()
    mem.count()
    t["blocking"] = time.time() - t0

    t0 = time.time()
    cand = B.candidate_pairs(mem, per_block_cap=64).cache()
    nc = cand.count()
    t["candidates"] = time.time() - t0

    t0 = time.time()
    labels, neg = C.closure_from_labeled_pairs(pairs, nodes=files.select("spec_id"))
    labels.cache().count()
    t["closure"] = time.time() - t0

    t0 = time.time()
    lp = (
        pairs.filter(F.col("split") == "train")
        .select(
            F.least("left_spec_id", "right_spec_id").alias("a"),
            F.greatest("left_spec_id", "right_spec_id").alias("b"),
            "label",
        )
        .distinct()
    )
    tp = S.pair_features_compact(lp, prep, sig_prefilter=None).select(
        "a", "b", "label", *S.FEATURE_COLS
    ).cache()
    tp.count()
    t["train_features"] = time.time() - t0

    t0 = time.time()
    model = S.fit_lr_newton(tp, max_rounds=8)
    t["fit"] = time.time() - t0

    t0 = time.time()
    cf = S.pair_features_compact(cand, prep, sig_prefilter=0.2).select(
        "a", "b", *S.FEATURE_COLS
    ).cache()
    nf = cf.count()
    t["cand_features"] = time.time() - t0

    t0 = time.time()
    scored = S.predict(cf, model)
    pos_edges = pairs.filter(F.col("label") == 1).select(
        F.least("left_spec_id", "right_spec_id").alias("a"),
        F.greatest("left_spec_id", "right_spec_id").alias("b"),
    )
    neg_pairs = pairs.filter(F.col("label") == 0).select(
        F.least("left_spec_id", "right_spec_id").alias("a"),
        F.greatest("left_spec_id", "right_spec_id").alias("b"),
    )
    pred = scored.filter(F.col("proba") >= model.threshold).select("a", "b").join(
        neg_pairs, ["a", "b"], "left_anti"
    )
    edges = pos_edges.unionByName(pred)
    final = C.connected_components(edges, nodes=files.select("spec_id"))
    final.count()
    t["cluster"] = time.time() - t0

    out = {
        "cpus": CPUS,
        "n_candidates": nc,
        "n_scored": nf,
        "total": round(sum(t.values()), 1),
        "stages": {k: round(v, 1) for k, v in t.items()},
        "newton_rounds": model.rounds_trained,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
