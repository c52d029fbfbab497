"""Query registry: named operator queries + DuckDB oracle SQL twins.

This is the driver-facing catalog (consumed by __spark_entry__.py).
Every SQL-expressible operator from SURVEY.md §2 gets a pair:

  QUERIES[name](spark, sf_dir) -> DataFrame
  ORACLE_SQL[name] = equivalent DuckDB SQL over the same parquet views

Column names and value formats are aligned between the two (aggregates
aliased identically; doubles rounded to 6 dp on both sides so the
driver's order-insensitive value hash matches bit-for-bit).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataentityresolution_spark.functions import hashes as H
from bigdataentityresolution_spark.functions import text as X
from bigdataentityresolution_spark.operators import tfidf as TI

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


# ---------------------------------------------------------------------------
# TF-IDF family (SURVEY.md §2.4, §2.6 — the reference's BoW stage)
# ---------------------------------------------------------------------------

_TOKENIZE_SQL = X.tokenize_sql("text")

@_register(
    "tfidf_postings",
    f"""
    SELECT doc_id, term, count(*) AS tf
    FROM (SELECT doc_id, unnest({_TOKENIZE_SQL}) AS term FROM documents)
    GROUP BY doc_id, term
    """,
)
def q_tfidf_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc, term, tf) hash aggregate — reference bow_add src/boWords.c:50-96."""
    return TI.postings(_load(spark, sf_dir, "documents"))


@_register(
    "tfidf_doc_lengths",
    f"""
    SELECT doc_id, count(*) AS n_tokens
    FROM (SELECT doc_id, unnest({_TOKENIZE_SQL}) AS term FROM documents)
    GROUP BY doc_id
    """,
)
def q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-record token count — reference spec->numofWords src/boWords.c:242."""
    return TI.doc_lengths(TI.postings(_load(spark, sf_dir, "documents")))


@_register(
    "tfidf_vocab",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENIZE_SQL}) AS term FROM documents
    ), postings AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), lengths AS (
      SELECT doc_id, sum(tf) AS n_tokens FROM postings GROUP BY doc_id
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT term,
           count(*) AS df,
           round(ln((SELECT n_docs FROM n) * 1.0 / count(*)), 6) AS idf,
           round(sum(tf * 1.0 / n_tokens) * ln((SELECT n_docs FROM n) * 1.0 / count(*))
                 / (SELECT n_docs FROM n), 6) AS tfidf_sum_mean
    FROM postings JOIN lengths USING (doc_id)
    GROUP BY term
    """,
)
def q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term df/idf/significance — reference src/boWords.c:552-619."""
    docs = _load(spark, sf_dir, "documents")
    v = TI.vocab(TI.postings(docs), n_docs=docs.count())
    return v.select(
        "term", "df", F.round("idf", 6).alias("idf"),
        F.round("tfidf_sum_mean", 6).alias("tfidf_sum_mean"),
    )


@_register(
    "tfidf_top100_vocab",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENIZE_SQL}) AS term FROM documents
    ), postings AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), lengths AS (
      SELECT doc_id, sum(tf) AS n_tokens FROM postings GROUP BY doc_id
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    vocab AS (
      SELECT term,
             sum(tf * 1.0 / n_tokens) * ln((SELECT n_docs FROM n) * 1.0 / count(*))
               / (SELECT n_docs FROM n) AS tsm
      FROM postings JOIN lengths USING (doc_id)
      GROUP BY term
    )
    SELECT term, round(tsm, 6) AS tfidf_sum_mean
    FROM vocab ORDER BY tsm DESC, term ASC LIMIT 100
    """,
)
def q_top100_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k significant words — reference MBH heap src/mbh.c:144-187."""
    docs = _load(spark, sf_dir, "documents")
    v = TI.vocab(TI.postings(docs), n_docs=docs.count())
    return TI.top_k_vocab(v, 100).select(
        "term", F.round("tfidf_sum_mean", 6).alias("tfidf_sum_mean")
    )


# ---------------------------------------------------------------------------
# Text analytics (training-data pipeline extensions)
# ---------------------------------------------------------------------------

@_register(
    "text_token_counts",
    f"SELECT doc_id, len({_TOKENIZE_SQL}) AS n_tokens, n_chars FROM documents",
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _load(spark, sf_dir, "documents").select(
        "doc_id", X.token_count("text").alias("n_tokens"), "n_chars"
    )


@_register(
    "text_fingerprint",
    "SELECT doc_id, md5(text) AS fp FROM documents",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _load(spark, sf_dir, "documents").select(
        "doc_id", X.fingerprint(F.col("text")).alias("fp")
    )


# ---------------------------------------------------------------------------
# Flagship (M1): TF-IDF top terms per document on sf0.001
# ---------------------------------------------------------------------------

def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """scan → tokenize/explode → tf/df/idf aggs → top-100 vocab (broadcast
    semi-join prune) → per-doc top-5 terms by tfidf (window).

    Exercises every M1 operator: SURVEY.md §7.1."""
    from pyspark.sql import Window as W

    docs = _load(spark, sf_dir, "documents")
    n_docs = docs.count()
    p = TI.postings(docs)
    v = TI.vocab(p, n_docs)
    top = TI.top_k_vocab(v, 100)
    flat = (
        TI.prune_postings(p, top)
        .join(F.broadcast(top.select("term", "idf")), "term")
        .join(TI.doc_lengths(p), "doc_id")
        .withColumn("tfidf", F.col("tf").cast("double") / F.col("n_tokens") * F.col("idf"))
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        flat.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "term", F.round("tfidf", 6).alias("tfidf"), "rank")
    )
