#!/usr/bin/env python
"""Which SEMANTIC blocking scheme surfaces orphan-kind pairs cheapest?

Candidate channels compared on the hard tier, against the orphan true
pairs the lexical MinHash channel cannot reach (est-J < sig_prefilter):

  A. top-k prefix blocking (PPJoin-family): each doc emits its k
     highest-TF-IDF terms as block keys; pairs sharing any such term
     become candidates. Cheap (k keys/doc, no new sketch), and rare
     discriminative identifiers are exactly what survives adversarial
     mutation in real code clones.
  B. SimHash-over-TF-IDF hyperplane bands (b bits x B bands): sign
     sketch of the weighted vector; near-cosine pairs share a band.

For each scheme: orphan-pair coverage (fraction of orphan true pairs
sharing >= 1 block), total corpus candidate volume after per-block cap,
and hot-block profile. Decides VERDICT r4 #1's channel design with data.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    os.environ["SPARK_GRAFT_HARD_SCALE"] = str(args.scale)
    os.environ["SPARK_GRAFT_HARD_CORPUS"] = f"/tmp/bench_hard_corpus_s{args.scale}"
    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)

    import bench
    bench.HARD_SCALE = args.scale
    bench.HARD_CORPUS_DIR = os.environ["SPARK_GRAFT_HARD_CORPUS"]
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bigdataentityresolution_spark.functions.text import tokenize
    from bigdataentityresolution_spark.operators import blocking as B
    from bigdataentityresolution_spark.operators import tfidf as TI
    from bigdataentityresolution_spark.session import get_spark

    spark = get_spark(app_name="semantic_blocking_probe")
    files, truth, pairs = bench.ensure_hard_corpus(spark)
    files = files.cache()
    n_docs = files.count()

    tok = tokenize("content")
    p = TI.postings(files, id_col="spec_id", text_col="content", tokenizer=tok).cache()
    vocab_k = min(max(1000, n_docs), 1_000_000)
    top_vocab = TI.er_vocab(TI.vocab(p, n_docs), n_docs, vocab_k, max_df_ratio=0.35).cache()
    vecs = TI.doc_vectors_indexed(p, top_vocab, n_docs, tf_mode="log").withColumnRenamed(
        "doc_id", "spec_id"
    ).cache()
    vecs.count()

    # lexical-channel baseline (what the pipeline already has)
    sigs = B.minhash_signatures_df(
        files, id_col="spec_id", text_col="content", shingle_n=2, num_perm=64, seed=42,
        tokenizer=tok,
    ).cache()
    lex_cand = B.candidate_pairs_with_est(sigs, bands=32, num_perm=64, per_block_cap=64).cache()
    n_lex = lex_cand.count()

    # orphan truth pairs and the subset the lexical channel misses
    kind = F.regexp_extract("spec_id", r"src/(hard|orphan)", 1)
    t = truth.withColumn("kind", kind).filter(F.col("kind") == "orphan")
    orphan = (
        t.select(F.col("spec_id").alias("a"), "cluster_id")
        .join(t.select(F.col("spec_id").alias("b"), "cluster_id"), "cluster_id")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    ).cache()
    n_orphan = orphan.count()
    lex_hit = orphan.join(
        lex_cand.filter(F.col("est_j") >= 0.12).select("a", "b"), ["a", "b"], "left_semi"
    ).count()
    print(f"docs={n_docs} lexical candidates={n_lex} orphan_pairs={n_orphan} "
          f"lexically-reachable (est_j>=0.12): {lex_hit} ({lex_hit/n_orphan:.1%})", flush=True)

    def evaluate(name: str, mem, cap: int = 64):
        w = Window.partitionBy("block_key").orderBy("spec_id")
        capped = (
            mem.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap).drop("_rn")
        )
        bs = capped.groupBy("block_key").agg(F.count(F.lit(1)).alias("m")).cache()
        vol = bs.agg(
            F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("pairs"),
            F.max("m").alias("max_m"), F.count(F.lit(1)).alias("n_blocks"),
        ).collect()[0]
        # orphan coverage via the capped membership (what candidates would see)
        am = capped.select(F.col("spec_id").alias("a"), "block_key")
        bm = capped.select(F.col("spec_id").alias("b"), "block_key")
        hit = orphan.join(am, "a").join(bm, ["b", "block_key"], "left_semi") \
            .select("a", "b").distinct()
        # of which: NEW vs the lexical channel's reachable set
        new_hit = hit.join(
            lex_cand.filter(F.col("est_j") >= 0.12).select("a", "b"), ["a", "b"], "left_anti"
        ).count()
        n_hit = hit.count()
        print(f"{name}: capped-pair-volume={int(vol['pairs'])} blocks={vol['n_blocks']} "
              f"max_block={vol['max_m']} orphan_cov={n_hit}/{n_orphan} ({n_hit/n_orphan:.1%}) "
              f"new-vs-lexical={new_hit} (+{new_hit/n_orphan:.1%})", flush=True)
        bs.unpersist()

    # --- scheme A: top-k prefix term blocking ---------------------------
    for k in (2, 3, 5):
        t0 = time.time()
        entries = vecs.select(
            "spec_id", F.explode(F.map_entries("features")).alias("e")
        ).select("spec_id", F.col("e.key").alias("term"), F.col("e.value").alias("w"))
        wnd = Window.partitionBy("spec_id").orderBy(F.desc("w"), "term")
        topk = (
            entries.withColumn("_r", F.row_number().over(wnd))
            .filter(F.col("_r") <= k)
            .select("spec_id", F.concat(F.lit("t:"), F.col("term")).alias("block_key"))
        )
        evaluate(f"A.top{k}-prefix", topk)
        print(f"   ({time.time()-t0:.1f}s)", flush=True)

    # --- scheme B: SimHash-over-TF-IDF bands ----------------------------
    from bigdataentityresolution_spark.functions.hashes import HASH_PRIME  # noqa: F401

    def simhash_mem(n_bits: int, bands: int, seed: int = 7):
        rows = n_bits // bands
        # sign of sum over map entries of w * rademacher(plane, term)
        def bit(i):
            s = F.aggregate(
                F.map_entries("features"),
                F.lit(0.0),
                lambda acc, e: acc
                + e["value"]
                * (F.pmod(F.xxhash64(e["key"], F.lit(i * 1315423911 + seed)), F.lit(2)) * 2 - 1),
            )
            return (s >= 0).cast("int")

        bits = F.array(*[bit(i) for i in range(n_bits)])
        keys = [
            F.concat_ws(
                ":", F.lit(f"b{b}"),
                F.concat_ws("", *[F.element_at(bits, b * rows + r + 1) for r in range(rows)]),
            )
            for b in range(bands)
        ]
        return vecs.select("spec_id", F.explode(F.array(*keys)).alias("block_key"))

    for n_bits, bands in ((64, 8), (96, 8), (128, 16)):
        t0 = time.time()
        evaluate(f"B.simhash{n_bits // bands}bx{bands}", simhash_mem(n_bits, bands))
        print(f"   ({time.time()-t0:.1f}s)", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
