"""SparkSession factory with scale-aware defaults.

Local-mode testing uses ``local[$SPARK_GRAFT_CPUS]``; the same builder
config is what we'd ship to a 1000-executor cluster via
``spark-submit --py-files`` (only master/memory change).

Design choices for 100 TB scale (SURVEY.md §4.2):
- AQE on: runtime coalescing, skew-join splitting, dynamic join strategy.
- Arrow on: every pandas UDF exchange is columnar, zero per-row Python.
- shuffle partitions sized to cores locally; on a real cluster this is
  set to ~2-3x total executor cores (or left to AQE's coalescing with a
  high initial partition number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bigdataentityresolution_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession used across the engine and tests."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode: the "driver" is the whole machine; the 1g default
        # result cap kills legitimate checkpoint/broadcast materializations
        .config("spark.driver.maxResultSize", "8g")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
