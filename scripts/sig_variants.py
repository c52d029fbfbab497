#!/usr/bin/env python
"""Isolate the signatures-stage anti-scaling at high thread counts.

Times several variants of the corpus-scan → minhash pipeline at
$SPARK_GRAFT_CPUS threads, fresh JVM per invocation. Variants:

  A  explode(split(lower(content))) → xxhash64 → groupBy(spec).count
     (no HOF filter — pure codegen baseline)
  B  current tokenize() (HOF filter) → explode → xxhash64 → count
  C  current full minhash_signatures_df (HOF shingles + 32 min aggs)
  D  shingle-free: explode tokens → xxhash64 → 32 min aggs
     (does the 32-way agg anti-scale, or the HOF shingles?)
  E  mapInPandas numpy minhash (Arrow batches, no JVM HOF at all)

Usage: SPARK_GRAFT_CPUS=32 python scripts/sig_variants.py A C E
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CORPUS = os.environ.get("SPARK_GRAFT_BENCH_CORPUS", "/tmp/bench_corpus_c8000_u16000")


def main() -> None:
    from pyspark.sql import functions as F

    from bigdataentityresolution_spark.functions.text import HASH_PRIME, tokenize
    from bigdataentityresolution_spark.operators.blocking import minhash_signatures_df
    from bigdataentityresolution_spark.session import get_spark

    which = sys.argv[1:] or ["A", "B", "C", "D", "E"]
    spark = get_spark(app_name=f"sigvar{CPUS}", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    files = spark.read.parquet(f"{CORPUS}/files").select("spec_id", "content").cache()
    files.count()

    out: dict[str, float] = {}

    if "A" in which:
        t0 = time.time()
        (
            files.select("spec_id", F.explode(F.split(F.lower("content"), "[^a-z0-9]+")).alias("t"))
            .select("spec_id", F.xxhash64("t").alias("h"))
            .groupBy("spec_id").agg(F.count("h").alias("n"), F.min("h").alias("m"))
            .agg(F.sum("n")).collect()
        )
        out["A_split_explode_hash"] = round(time.time() - t0, 1)

    if "B" in which:
        t0 = time.time()
        (
            files.select("spec_id", F.explode(tokenize("content")).alias("t"))
            .select("spec_id", F.xxhash64("t").alias("h"))
            .groupBy("spec_id").agg(F.count("h").alias("n"), F.min("h").alias("m"))
            .agg(F.sum("n")).collect()
        )
        out["B_hof_tokenize"] = round(time.time() - t0, 1)

    if "C" in which:
        t0 = time.time()
        minhash_signatures_df(files, tokenizer=tokenize("content")).select(
            F.sum(F.element_at("sig", 1))
        ).collect()
        out["C_full_signatures"] = round(time.time() - t0, 1)

    if "D" in which:
        from bigdataentityresolution_spark.functions.hashes import perm_params

        t0 = time.time()
        hashed = files.select(
            "spec_id", F.explode(tokenize("content")).alias("t")
        ).select("spec_id", F.pmod(F.xxhash64("t"), F.lit(HASH_PRIME)).alias("h"))
        aggs = [
            F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(HASH_PRIME)).alias(f"mh{i}")
            for i, (a, b) in enumerate(perm_params(32, 42))
        ]
        hashed.groupBy("spec_id").agg(*aggs).select(F.sum("mh0")).collect()
        out["D_tokens_32aggs"] = round(time.time() - t0, 1)

    if "E" in which:
        import re

        import numpy as np
        import pandas as pd

        from bigdataentityresolution_spark.functions.hashes import perm_params

        params = perm_params(32, 42)

        def minhash_batches(it):
            pat = re.compile(r"[^a-z0-9]+")
            A = np.array([p[0] for p in params], dtype=np.uint64)
            Bc = np.array([p[1] for p in params], dtype=np.uint64)
            P = np.uint64(HASH_PRIME)
            for pdf in it:
                ids, sigs = [], []
                for sid, content in zip(pdf["spec_id"], pdf["content"]):
                    toks = [t for t in pat.split(content.lower()) if t]
                    if len(toks) >= 2:
                        sh = [hash(toks[i] + " " + toks[i + 1]) for i in range(len(toks) - 1)]
                    else:
                        sh = [hash(" ".join(toks))]
                    h = np.array(sh, dtype=np.int64).astype(np.uint64) % P
                    vals = (h[:, None] * A[None, :] + Bc[None, :]) % P
                    sigs.append(vals.min(axis=0).astype(np.int64))
                    ids.append(sid)
                yield pd.DataFrame({"spec_id": ids, "sig": [list(s) for s in sigs]})

        t0 = time.time()
        files.mapInPandas(minhash_batches, "spec_id string, sig array<long>").select(
            F.sum(F.element_at("sig", 1))
        ).collect()
        out["E_mapInPandas"] = round(time.time() - t0, 1)

    if "F" in which:
        from bigdataentityresolution_spark.functions.hashes import perm_params

        COMB = 1_000_003
        t0 = time.time()
        th_df = files.select(
            "spec_id",
            F.transform(
                tokenize("content"), lambda t: F.pmod(F.xxhash64(t), F.lit(HASH_PRIME))
            ).alias("th"),
        )
        k = F.size("th")
        m = F.greatest(k - F.lit(1), F.lit(1))

        def gram(i):
            e0 = F.coalesce(F.element_at(F.col("th"), i), F.lit(0).cast("long"))
            e1 = F.coalesce(F.element_at(F.col("th"), i + F.lit(1)), F.lit(0).cast("long"))
            return (e0 * F.lit(COMB) + e1) % F.lit(HASH_PRIME)

        sh = th_df.select(
            "spec_id", F.explode(F.transform(F.sequence(F.lit(1), m), gram)).alias("h")
        )
        aggs = [
            F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(HASH_PRIME)).alias(f"mh{i}")
            for i, (a, b) in enumerate(perm_params(32, 42))
        ]
        sh.groupBy("spec_id").agg(*aggs).select(F.sum("mh0")).collect()
        out["F_numeric_shingles"] = round(time.time() - t0, 1)

    if "G" in which:
        from pyspark.sql import Window

        from bigdataentityresolution_spark.functions.hashes import perm_params

        COMB = 1_000_003
        t0 = time.time()
        tok_rows = files.select(
            "spec_id", F.posexplode(tokenize("content")).alias("pos", "t")
        ).select("spec_id", "pos", F.pmod(F.xxhash64("t"), F.lit(HASH_PRIME)).alias("h"))
        w = Window.partitionBy("spec_id").orderBy("pos")
        grams = tok_rows.withColumn("h2", F.lead("h", 1).over(w)).select(
            "spec_id",
            ((F.col("h") * F.lit(COMB) + F.coalesce("h2", F.lit(0))) % F.lit(HASH_PRIME)).alias(
                "h"
            ),
        )
        aggs = [
            F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(HASH_PRIME)).alias(f"mh{i}")
            for i, (a, b) in enumerate(perm_params(32, 42))
        ]
        grams.groupBy("spec_id").agg(*aggs).select(F.sum("mh0")).collect()
        out["G_posexplode_lag"] = round(time.time() - t0, 1)

    print({"cpus": CPUS, **out})
    spark.stop()


if __name__ == "__main__":
    main()
