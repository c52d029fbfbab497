#!/usr/bin/env python
"""Cluster-entry job: the flagship ER pipeline under `spark-submit --py-files`.

North-rule deployment shape: "the whole pipeline runs via spark-submit
--py-files". This job contains NO sys.path hacks — every
`bigdataentityresolution_spark` import resolves from the zip shipped with
--py-files, on the driver and on executors, exactly as on a real cluster:

    PKG=$(mktemp /tmp/bde_pkg_XXXXXX.zip)
    (cd <repo> && zip -qr "$PKG" bigdataentityresolution_spark)
    spark-submit --master local[4] --py-files "$PKG" \
        scripts/submit_job.py <out_dir> [n_clusters] [n_unrelated]

The SparkSession is built with a bare builder — master, memory, and any
site conf come from spark-submit flags, as they would from a cluster
manager. Writes <out_dir>/labels parquet, stage checkpoints under
<out_dir>/stages (resumable), and prints one JSON line with pairwise F1
against the generator's ground truth.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bde_submit_out"
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    n_unrelated = int(sys.argv[3]) if len(sys.argv) > 3 else 400

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("bde-er-submit")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    # package imports — resolved from the --py-files zip
    from bigdataentityresolution_spark.plans.pipeline import (
        ERConfig,
        pairwise_f1,
        run_er_pipeline,
    )
    from bigdataentityresolution_spark.sources.synthetic import (
        corpus_to_spark,
        generate_corpus,
    )

    corpus = generate_corpus(
        n_clusters=n_clusters, n_unrelated=n_unrelated, n_repos=10, seed=7
    )
    files, truth, pairs = corpus_to_spark(spark, corpus)
    files = files.cache()

    result = run_er_pipeline(
        spark,
        files,
        pairs,
        workdir=os.path.join(out_dir, "stages"),
        config=ERConfig(self_train=False),
    )
    labels = result["labels"]
    labels.write.mode("overwrite").parquet(os.path.join(out_dir, "labels"))
    f1 = pairwise_f1(labels, truth)
    print(
        json.dumps(
            {
                "f1": round(f1["f1"], 4),
                "n_files": files.count(),
                "n_clusters_found": labels.select("cluster_id").distinct().count(),
                "out": out_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
