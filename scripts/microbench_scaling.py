#!/usr/bin/env python
"""Isolate per-stage thread-scaling pathologies: run ONE pipeline stage
standalone at a given core count and print wall time.

Usage: SPARK_GRAFT_CPUS=8 python scripts/microbench_scaling.py signatures
Stages: signatures | candfeat | cc | sort
Env knobs: SPARK_GRAFT_LOCAL_DIR, SPARK_GRAFT_DRIVER_MEM, MB_SHUFFLE (partitions)
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
SHUF = int(os.environ.get("MB_SHUFFLE", str(CPUS)))


def main() -> None:
    stage = sys.argv[1] if len(sys.argv) > 1 else "signatures"
    from pyspark.sql import functions as F

    from bigdataentityresolution_spark.functions.text import tokenize
    from bigdataentityresolution_spark.operators import blocking as B
    from bigdataentityresolution_spark.session import get_spark

    spark = get_spark(
        app_name=f"mb{CPUS}", master=f"local[{CPUS}]", shuffle_partitions=SHUF
    )
    files = spark.read.parquet(f"{CORPUS}/files").cache()
    files.count()

    tok = tokenize("content")
    t0 = time.time()
    if stage == "signatures":
        reps = int(os.environ.get("MB_REPEAT", "1"))
        for r in range(reps):
            t0 = time.time()
            sigs = B.minhash_signatures_df(
                files, id_col="spec_id", text_col="content", tokenizer=tok
            )
            n = sigs.count()
            print(f"rep{r}: {time.time()-t0:.2f}s")
    elif stage == "candfeat":
        from bigdataentityresolution_spark.operators import scoring as S
        from bigdataentityresolution_spark.operators import tfidf as TI

        sigs = B.minhash_signatures_df(
            files, id_col="spec_id", text_col="content", tokenizer=tok
        ).cache()
        sigs.count()
        mem = B.membership_from_signatures(sigs)
        cand = B.candidate_pairs(mem).cache()
        cand.count()
        n_docs = files.count()
        p = TI.postings(files, id_col="spec_id", text_col="content", tokenizer=tok)
        v = TI.vocab(p, n_docs)
        top = TI.top_k_vocab(v, 1000)
        vecs = TI.doc_vectors_indexed(p, top, n_docs).withColumnRenamed("doc_id", "spec_id")
        prep = (
            files.select("spec_id", F.substring("content", 1, 128).alias("prefix"))
            .join(vecs, "spec_id", "left")
            .withColumn(
                "features",
                F.coalesce(
                    "features",
                    F.map_from_arrays(F.array().cast("array<int>"), F.array().cast("array<float>")),
                ),
            )
            .join(sigs, "spec_id")
            .cache()
        )
        prep.count()
        t0 = time.time()
        cf = S.pair_features_compact(cand, prep, sig_prefilter=0.2)
        n = cf.count()
    elif stage == "cc":
        from bigdataentityresolution_spark.operators import clustering as C

        pairs = spark.read.parquet(f"{CORPUS}/pairs").cache()
        pairs.count()
        pos = pairs.filter(F.col("label") == 1).select(
            F.col("left_spec_id").alias("a"), F.col("right_spec_id").alias("b")
        )
        t0 = time.time()
        labels = C.connected_components(pos, nodes=files.select("spec_id"))
        n = labels.count()
    elif stage == "sort":
        # pure shuffle control: no HOFs, no Python — isolates engine overhead
        n = (
            files.select("spec_id", F.xxhash64("content").alias("h"))
            .repartition(SHUF, "h")
            .groupBy(F.pmod("h", F.lit(1000)).alias("k"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("h").alias("s"))
            .count()
        )
    else:
        raise SystemExit(f"unknown stage {stage}")
    dt = time.time() - t0
    print(json.dumps({"stage": stage, "cpus": CPUS, "shuffle": SHUF, "sec": round(dt, 2), "n": n}))
    spark.stop()


if __name__ == "__main__":
    main()
