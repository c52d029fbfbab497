"""Synthetic corpus generator: determinism, shape, sha256 invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataentityresolution_spark.sources.synthetic import (
    Corpus,
    generate_corpus,
    python_sha256,
)


def test_deterministic_same_seed():
    c1 = generate_corpus(n_clusters=10, n_unrelated=10, seed=7)
    c2 = generate_corpus(n_clusters=10, n_unrelated=10, seed=7)
    assert c1.files == c2.files
    assert c1.pairs == c2.pairs
    c3 = generate_corpus(n_clusters=10, n_unrelated=10, seed=8)
    assert c1.files != c3.files


def test_corpus_shape_and_truth(tiny_corpus):
    assert tiny_corpus.meta["n_files"] == len(tiny_corpus.files) == len(tiny_corpus.truth)
    sids = {Corpus.spec_id(r, p, c) for r, p, c, _, _ in tiny_corpus.files}
    assert len(sids) == len(tiny_corpus.files)  # unique spec ids
    # splits present in expected ratio
    splits = [s for _, _, _, s in tiny_corpus.pairs]
    n = len(splits)
    assert abs(splits.count("train") / n - 0.6) < 0.02
    assert abs(splits.count("test") / n - 0.2) < 0.02


def test_sha256_invariant_spark_vs_python(spark, tiny_tables, tiny_corpus):
    files_df, _, _ = tiny_tables
    got = {r["spec_id"]: r["content_sha"] for r in files_df.select("spec_id", "content_sha").collect()}
    for repo, path, commit, _, content in tiny_corpus.files:
        sid = Corpus.spec_id(repo, path, commit)
        assert got[sid] == python_sha256(content)


def test_zipfian_repo_skew(tiny_tables):
    files_df, _, _ = tiny_tables
    counts = [r["n"] for r in files_df.groupBy("repo").agg(F.count("*").alias("n")).collect()]
    counts.sort(reverse=True)
    # hottest repo should hold several times the coldest's share
    assert counts[0] >= 4 * counts[-1]
