"""Shared pytest fixtures: one session-scoped SparkSession (local[N])."""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # small local runs for tests

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    from bigdataentityresolution_spark.session import get_spark

    s = get_spark(app_name="bder-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus():
    from bigdataentityresolution_spark.sources.synthetic import generate_corpus

    return generate_corpus(n_clusters=40, n_unrelated=60, seed=42)


@pytest.fixture(scope="session")
def tiny_tables(spark, tiny_corpus):
    from bigdataentityresolution_spark.sources.synthetic import corpus_to_spark

    files_df, truth_df, pairs_df = corpus_to_spark(spark, tiny_corpus)
    files_df = files_df.cache()
    truth_df = truth_df.cache()
    pairs_df = pairs_df.cache()
    return files_df, truth_df, pairs_df


def sf_dir(sf: str) -> str:
    return os.path.join(TESTDATA, f"sf{sf}")
