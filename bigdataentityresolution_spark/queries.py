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
# Filters & predicates (SURVEY.md §2.2)
# ---------------------------------------------------------------------------

@_register(
    "filter_point_lookup",
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = 7",
)
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key lookup → point filter (findRecord_byKey, src/myHash.c:221-252)."""
    return _load(spark, sf_dir, "orders").filter(F.col("o_orderkey") == 7).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@_register(
    "filter_token_admission",
    f"""
    SELECT doc_id, pos, tok FROM (
      SELECT doc_id, unnest({X.admitted_tokens_sql('text')}) AS tok,
             generate_subscripts({X.admitted_tokens_sql('text')}, 1) AS pos
      FROM documents
    )
    """,
)
def q_token_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """checkWord parity: alnum-only, lowercased, exact stopword drop
    (src/boWords.c:251-275; deliberate strstr-quirk fix SURVEY.md §7.2).

    Output is EXPLODED to one row per (doc, position, token): the driver's
    value-hash canonicalizer cannot factorize ARRAY cells (r01 err), and
    rows preserve order information via the 1-based pos column."""
    d = _load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(X.admitted_tokens("text")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "tok")


@_register(
    "filter_confidence_band",
    """
    SELECT event_id, round(1.0/(1.0+exp(-(value - 50.0)/25.0)), 6) AS proba
    FROM events
    WHERE (1.0/(1.0+exp(-(value - 50.0)/25.0)) >= 0.85 AND 1.0/(1.0+exp(-(value - 50.0)/25.0)) < 1.0)
       OR (1.0/(1.0+exp(-(value - 50.0)/25.0)) > 0.0 AND 1.0/(1.0+exp(-(value - 50.0)/25.0)) <= 0.15)
    """,
)
def q_confidence_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-training confidence band [0.85/0.15] over a sigmoid score
    (src/functs.c:1846-1852) exercised on the events table."""
    ev = _load(spark, sf_dir, "events")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("value") - 50.0) / 25.0))
    return (
        ev.withColumn("proba", p)
        .filter(((F.col("proba") >= 0.85) & (F.col("proba") < 1.0)) | ((F.col("proba") > 0.0) & (F.col("proba") <= 0.15)))
        .select("event_id", F.round("proba", 6).alias("proba"))
    )


@_register(
    "filter_weak_pruning",
    """
    WITH scored AS (
      SELECT event_id, 1.0/(1.0+exp(-(value - 50.0)/25.0)) AS proba
      FROM events
    )
    SELECT event_id, round(proba, 6) AS proba
    FROM scored
    WHERE proba >= (1.0 - (1.0 - 0.6)/3.0) OR proba <= (0.6/3.0)
    """,
)
def q_weak_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak-example pruning at threshold t=0.6 (dataI_remove_weak,
    src/logistic.c:1040-1065): keep proba >= 1-(1-t)/3 or <= t/3, the
    strict middle bands dropped. Same deterministic sigmoid score over
    events as filter_confidence_band."""
    from bigdataentityresolution_spark.operators.scoring import prune_weak_examples

    ev = _load(spark, sf_dir, "events")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("value") - 50.0) / 25.0))
    return prune_weak_examples(ev.withColumn("proba", p), threshold=0.6).select(
        "event_id", F.round("proba", 6).alias("proba")
    )


@_register(
    "pair_concat_sparse",
    """
    WITH p AS (
      SELECT d1.doc_id AS a, d2.doc_id AS b
      FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
    )
    SELECT a, b, CAST(a % 7 AS INT) AS idx, (a % 13) * 0.25 AS val FROM p
    UNION ALL
    SELECT a, b, CAST(a % 5 + 7 AS INT), (a % 17) * 0.5 FROM p
    UNION ALL
    SELECT a, b, CAST(b % 7 + 12 AS INT), (b % 13) * 0.25 FROM p
    UNION ALL
    SELECT a, b, CAST(b % 5 + 19 AS INT), (b % 17) * 0.5 FROM p
    """,
)
def q_pair_concat_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse pair-feature concat (spars_concat_col,
    src/functs.c:1185-1203): b-side indices offset by the vocab size
    (12 here). Doc 'vectors' are deterministic int-keyed maps derived
    from doc_id (quarter/half-step values — exact in float32, so no
    rounding mismatch vs the oracle's doubles); output exploded to
    (a, b, idx, val)."""
    from bigdataentityresolution_spark.operators.scoring import (
        pair_feature_concat_sparse,
    )

    d = _load(spark, sf_dir, "documents").select("doc_id")
    vecs = d.select(
        F.col("doc_id").alias("spec_id"),
        F.map_from_arrays(
            F.array(
                (F.col("doc_id") % 7).cast("int"),
                (F.col("doc_id") % 5 + 7).cast("int"),
            ),
            F.array(
                ((F.col("doc_id") % 13) * 0.25).cast("float"),
                ((F.col("doc_id") % 17) * 0.5).cast("float"),
            ),
        ).alias("features"),
    )
    pairs = d.select(F.col("doc_id").alias("a")).join(
        d.select((F.col("doc_id") - 1).alias("a"), F.col("doc_id").alias("b")), "a"
    )
    out = pair_feature_concat_sparse(pairs, vecs, vocab_k=12)
    return out.select(
        "a", "b", F.explode("pair_features").alias("idx", "val")
    ).select("a", "b", "idx", F.col("val").cast("double").alias("val"))


@_register(
    "pair_concat_dense",
    """
    WITH p AS (
      SELECT d1.doc_id AS a, d2.doc_id AS b,
             (d1.doc_id % 13) * 0.25 AS sum_a, (d2.doc_id % 13) * 0.25 AS sum_b
      FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
    ), pos AS (SELECT unnest(range(0, 8)) AS pos)
    SELECT a, b, CAST(pos AS INT) AS pos,
      CASE
        WHEN sum_a >= sum_b THEN
          CASE WHEN pos < 4 AND pos = a % 4 THEN sum_a
               WHEN pos >= 4 AND pos - 4 = b % 4 THEN sum_b
               ELSE 0.0 END
        ELSE
          CASE WHEN pos < 4 AND pos = b % 4 THEN sum_b
               WHEN pos >= 4 AND pos - 4 = a % 4 THEN sum_a
               ELSE 0.0 END
      END AS val
    FROM p CROSS JOIN pos
    """,
)
def q_pair_concat_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense pair-feature concat (concat_specVectors,
    src/functs.c:1005-1031): 2k floats per pair, the larger-sum vector
    first (ties keep the left side). Single-entry synthetic vectors
    {doc_id%4: (doc_id%13)*0.25} make the oracle's ordering CASE exact;
    output exploded to (a, b, pos, val)."""
    from bigdataentityresolution_spark.operators.scoring import (
        pair_feature_concat_dense,
    )

    d = _load(spark, sf_dir, "documents").select("doc_id")
    vecs = d.select(
        F.col("doc_id").alias("spec_id"),
        F.map_from_arrays(
            F.array((F.col("doc_id") % 4).cast("int")),
            F.array(((F.col("doc_id") % 13) * 0.25).cast("float")),
        ).alias("features"),
    )
    pairs = d.select(F.col("doc_id").alias("a")).join(
        d.select((F.col("doc_id") - 1).alias("a"), F.col("doc_id").alias("b")), "a"
    )
    out = pair_feature_concat_dense(pairs, vecs, vocab_k=4)
    return out.select(
        "a", "b", F.posexplode("pair_features").alias("pos", "val")
    ).select(
        "a", "b", F.col("pos").cast("int").alias("pos"),
        F.col("val").cast("double").alias("val"),
    )


@_register(
    "filter_claim_per_set",
    """
    SELECT DISTINCT o_custkey AS spec_id,
           CASE WHEN o_orderkey % 2 = 0 THEN 't' ELSE 'v' END AS claim_set
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer)
    """,
)
def q_claim_per_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visited-flag per-set claim filter (findRecord_forSet,
    src/myHash.c:255-309): duplicate claim requests collapse to one per
    (record, set); requests for unknown records are dropped. Exercised
    as order→customer claims with the order parity choosing the set."""
    from bigdataentityresolution_spark.sources.readers import claim_records_for_sets

    reqs = _load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("spec_id"),
        F.when(F.col("o_orderkey") % 2 == 0, "t").otherwise("v").alias("claim_set"),
    )
    recs = _load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("spec_id"))
    return claim_records_for_sets(reqs, recs, set_col="claim_set")


@_register(
    "filter_trainable_records",
    """
    WITH RECURSIVE e AS (
      SELECT d1.doc_id AS a, d2.doc_id AS b
      FROM documents d1 JOIN documents d2
        ON d2.doc_id = d1.doc_id + 1 AND d1.lang = d2.lang
    ), sym AS (
      SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e
    ), reach(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT s.a, r.lbl FROM sym s JOIN reach r ON s.b = r.node
    ), labels AS (
      SELECT node AS spec_id, min(lbl) AS cluster_id FROM reach GROUP BY node
    )
    SELECT spec_id FROM labels
    WHERE cluster_id IN (
      SELECT cluster_id FROM labels GROUP BY cluster_id HAVING count(*) >= 2
    )
    """,
)
def q_trainable_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainable-record filter (retrain_with_all, src/functs.c:1740-1743):
    keep records whose cluster has >1 member or negative links. Cluster
    labels come from the deterministic doc-id chain edges (same edge set
    as connected_components_chains; no negative edges here)."""
    from bigdataentityresolution_spark.operators.clustering import (
        connected_components,
        trainable_records,
    )

    d = _load(spark, sf_dir, "documents").select("doc_id", "lang")
    d2 = d.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.col("lang").alias("lang2"),
        F.col("doc_id").alias("b"),
    )
    edges = (
        d.join(d2, "doc_id")
        .filter(F.col("lang") == F.col("lang2"))
        .select(F.col("doc_id").alias("a"), "b")
    )
    labels = connected_components(edges, nodes=d.select("doc_id"))
    return trainable_records(labels)


# ---------------------------------------------------------------------------
# Joins & pair generation (SURVEY.md §2.3)
# ---------------------------------------------------------------------------

@_register(
    "join_id_resolution",
    """
    SELECT o.o_orderkey, c.c_name, c.c_nationkey, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 100000
    """,
)
def q_id_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV-id → record-store probe join (src/functs.c:612-621): equi join,
    small side broadcast."""
    o = _load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    c = _load(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_name", "c_nationkey", "o_totalprice"
    )


@_register(
    "join_semi_anti",
    """
    SELECT c_custkey,
           CASE WHEN c_custkey IN (SELECT o_custkey FROM orders) THEN 1 ELSE 0 END AS has_orders
    FROM customer
    """,
)
def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti membership checks (isPair cluster/neg scans,
    src/functs.c:1331-1351) as one boolean projection."""
    c = _load(spark, sf_dir, "customer")
    o = _load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey")).distinct()
    return (
        c.join(o.withColumn("_has", F.lit(1)), "c_custkey", "left")
        .select("c_custkey", F.coalesce("_has", F.lit(0)).alias("has_orders"))
    )


@_register(
    "pair_generation_blocked",
    """
    SELECT d1.doc_id AS a, d2.doc_id AS b, d1.lang
    FROM documents d1 JOIN documents d2
      ON d1.lang = d2.lang AND d1.doc_id < d2.doc_id
    WHERE d1.doc_id % 10 = 0 AND d2.doc_id % 10 = 0
    """,
)
def q_pair_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked all-with-all pair generation (retrain_with_all,
    src/functs.c:1731-1806): within-block self-join with a < b."""
    d = _load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", "lang"
    )
    d1 = d.select(F.col("doc_id").alias("a"), "lang")
    d2 = d.select(F.col("doc_id").alias("b"), "lang")
    return d1.join(d2, "lang").filter(F.col("a") < F.col("b")).select("a", "b", "lang")


@_register(
    "candidate_pairs_capped",
    """
    WITH mem AS (
      SELECT CAST(doc_id AS VARCHAR) AS spec_id,
             CAST(CAST(FLOOR(SQRT(doc_id)) AS INT) AS VARCHAR) AS block_key
      FROM documents
    ), capped AS (
      SELECT spec_id, block_key,
             row_number() OVER (PARTITION BY block_key ORDER BY spec_id) AS rn
      FROM mem
    )
    SELECT DISTINCT c1.spec_id AS a, c2.spec_id AS b
    FROM capped c1 JOIN capped c2
      ON c1.block_key = c2.block_key AND c1.spec_id < c2.spec_id
    WHERE c1.rn <= 16 AND c2.rn <= 16
    """,
)
def q_candidate_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION blocked candidate generator (blocking.candidate_pairs:
    window cap → per-block member array → expression-side pair explosion →
    distinct) against a full-fidelity SQL oracle INCLUDING the per-block
    cap semantics (row_number over spec_id string order, first 16 kept).

    Membership is a deterministic Zipf-ish blocking over documents:
    block k = floor(sqrt(doc_id)) has ~2k+1 members, so block sizes span
    1 → 45 at sf0.01 and the cap genuinely binds on the large blocks —
    the reference's bucket-stripe + pairs_limit analog
    (src/functs.c:1718,1752-1768). sqrt is IEEE-exact on integers < 2^53
    so FLOOR(SQRT(·)) agrees bit-for-bit across engines.
    """
    from bigdataentityresolution_spark.operators import blocking as B

    mem = _load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("spec_id"),
        F.floor(F.sqrt("doc_id")).cast("int").cast("string").alias("block_key"),
    )
    return B.candidate_pairs(mem, per_block_cap=16)


@_register(
    "semantic_topk_blocking",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENIZE_SQL}) AS term FROM documents
    ), postings AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), lengths AS (
      SELECT doc_id, sum(tf) AS n_tokens FROM postings GROUP BY doc_id
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    vocab AS (
      SELECT term, count(*) AS df,
             round(sum(tf * 1.0 / n_tokens) * ln((SELECT n_docs FROM n) * 1.0 / count(*))
               / (SELECT n_docs FROM n), 6) AS tsm
      FROM postings JOIN lengths USING (doc_id)
      GROUP BY term
    ), top AS (
      SELECT term, ln((SELECT n_docs FROM n) * 1.0 / df) AS idf,
             row_number() OVER (ORDER BY tsm DESC, term ASC) - 1 AS term_idx
      FROM vocab ORDER BY tsm DESC, term ASC LIMIT 100
    ), weights AS (
      SELECT p.doc_id, t.term_idx,
             CAST((1 + ln(p.tf)) * t.idf AS REAL) AS w
      FROM postings p JOIN top t USING (term)
    ), ranked AS (
      SELECT doc_id, term_idx,
             row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, term_idx ASC) AS r
      FROM weights
    )
    SELECT CAST(doc_id AS VARCHAR) AS spec_id,
           't:' || CAST(term_idx AS VARCHAR) AS block_key
    FROM ranked WHERE r <= 3
    """,
)
def q_semantic_topk_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r5 SEMANTIC candidate channel's blocking operator
    (blocking.semantic_topk_membership): each doc's top-3 TF-IDF terms
    (sublinear-TF weights over the top-100 vocabulary, float32 — the
    pair-join representation) become block keys, selected EXPRESSION-SIDE
    (sort/slice of the doc's weight map, no per-doc window). The oracle
    reproduces the full chain — vocabulary ranking, dense term indexing,
    (1+ln tf)·idf weights CAST to REAL so both engines rank on identical
    float32 values, per-doc top-3 with ties toward the smaller term
    index. Cross-engine determinism: the significance score is rounded
    to 6 dp on BOTH sides BEFORE the rank that assigns term_idx — vocab
    tsm is a floating SUM whose accumulation order differs between
    Spark partial aggregation and DuckDB, and the rank index is embedded
    in the block-key VALUES, so an unrounded near-tie swap would shift
    every later index. No reference analog (single-channel blocking,
    src/functs.c:1731-1881); this is the engine's own channel, oracle-
    checked end-to-end."""
    from bigdataentityresolution_spark.operators import blocking as B

    docs = _load(spark, sf_dir, "documents")
    n = docs.count()
    p = TI.postings(docs)
    v = TI.vocab(p, n).withColumn("tfidf_sum_mean", F.round("tfidf_sum_mean", 6))
    tv = TI.index_vocab(TI.top_k_vocab(v, 100))
    vecs = (
        TI.doc_vectors_indexed(p, tv, n, tf_mode="log")
        .select(F.col("doc_id").cast("string").alias("spec_id"), "features")
    )
    return B.semantic_topk_membership(vecs, k=3)


@_register(
    "hotkey_salted_parity",
    """
    SELECT CAST(doc_id AS VARCHAR) AS a, CAST(doc_id AS VARCHAR) AS b
    FROM documents WHERE 1 = 0
    """,
)
def q_hotkey_salted_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped-vs-salted candidate-set EQUALITY as an empty symmetric
    difference (VERDICT r4 #5): on the same Zipf-ish block membership
    (floor(sqrt(doc_id)) — hot blocks up to 45 members at sf0.01),
    candidate_pairs and candidate_pairs_salted(salt_buckets=8) must emit
    the IDENTICAL pair set whenever no per-(sub)block cap binds — the
    salting decomposition (within-salt pairs ∪ cross-salt join) is
    exhaustive and non-duplicating. The oracle is the empty relation;
    any diff row fails the rowcount/hash compare.
    """
    from bigdataentityresolution_spark.operators import blocking as B

    mem = _load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("spec_id"),
        F.floor(F.sqrt("doc_id")).cast("int").cast("string").alias("block_key"),
    )
    capped = B.candidate_pairs(mem, per_block_cap=100_000)
    salted = B.candidate_pairs_salted(mem, per_block_cap=100_000, salt_buckets=8)
    return capped.exceptAll(salted).unionByName(salted.exceptAll(capped))


# ---------------------------------------------------------------------------
# Aggregations (SURVEY.md §2.4)
# ---------------------------------------------------------------------------

@_register(
    "agg_tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           count(*) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@_register(
    "agg_label_balance",
    "SELECT label, count(*) AS n FROM embeddings GROUP BY label",
)
def q_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fit1/fit0 label counters (logistic_overfit_dataList,
    src/logistic.c:693-702)."""
    return _load(spark, sf_dir, "embeddings").groupBy("label").agg(
        F.count(F.lit(1)).alias("n")
    )


@_register(
    "agg_accuracy",
    """
    SELECT round(avg(CASE WHEN (n_chars > 250) = (label = 1) THEN 1.0 ELSE 0.0 END), 6) AS acc
    FROM (SELECT d.n_chars, e.label FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id)
    """,
)
def q_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corrects/total accuracy aggregate (logistic_score,
    src/logistic.c:601-615) over a toy predictor."""
    d = _load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    e = _load(spark, sf_dir, "embeddings").select(F.col("vec_id").alias("doc_id"), "label")
    j = d.join(e, "doc_id")
    return j.select(
        F.round(
            F.avg(((F.col("n_chars") > 250) == (F.col("label") == 1)).cast("double")), 6
        ).alias("acc")
    )


@_register(
    "agg_gradient_batch",
    """
    WITH t AS (
      SELECT event_id % 8 AS batch,
             value/100.0 AS x1,
             (event_id % 7)/7.0 AS x2,
             CASE WHEN event_id % 3 = 0 THEN 1.0 ELSE 0.0 END AS label
      FROM events
    ), s AS (
      SELECT batch, x1, x2, label,
             1.0/(1.0+exp(-(0.25 + 0.7*x1 - 1.3*x2))) - label AS missed
      FROM t
    )
    SELECT batch, CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(missed), 6) AS b_grad,
           round(sum(abs(missed)), 6) AS abs_missed_sum,
           round(sum(x1*missed)/count(*), 6) AS g0,
           round(sum(x2*missed)/count(*), 6) AS g1
    FROM s GROUP BY batch
    """,
)
def q_gradient_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch partial gradient reduction of the mini-batch LR loop
    (src/logistic.c:346-472: per-batch gradient sums reduced across the
    thread pool), exercised through the PRODUCTION Arrow kernel
    (scoring._batch_gradient_kernel) at fixed weights w=(0.7,-1.3),
    b=0.25 over features derived from the events table. Oracle:
    closed-form SQL (gradient_j = sum(x_j*(sigmoid(w.x)-y))/n per batch).

    Known flake mode (latent, documented — VERDICT r3 'What's wrong' #3):
    the hash compare depends on round(·, 6) agreeing between the kernel's
    numpy pairwise summation and DuckDB's sequential fsum. With the fixed
    8-batch split each batch holds ≤ ~7.5k rows at sf0.01, so the two
    summation orders agree to ~1e-12 — far inside the 0.5e-6 rounding
    boundary — but a much larger per-batch n (or a near-boundary sum like
    x.xxxxxx5) could flip the 6th decimal. If this row ever hash-flakes,
    raise the batch count (keeps per-batch n bounded) rather than
    loosening the rounding."""
    import numpy as np
    import pandas as pd

    from bigdataentityresolution_spark.operators.scoring import _batch_gradient_kernel

    ev = _load(spark, sf_dir, "events").select(
        F.pmod(F.col("event_id"), F.lit(8)).alias("batch"),
        (F.col("value") / F.lit(100.0)).alias("x1"),
        (F.pmod(F.col("event_id"), F.lit(7)) / F.lit(7.0)).alias("x2"),
        F.when(F.pmod(F.col("event_id"), F.lit(3)) == 0, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("label"),
    )
    kernel, schema = _batch_gradient_kernel(("x1", "x2"), np.array([0.7, -1.3]), 0.25)

    def with_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        out = kernel(pdf)
        out.insert(0, "batch", [int(pdf["batch"].iloc[0])])
        return out

    res = ev.groupBy("batch").applyInPandas(with_batch, "batch long, " + schema)
    return res.select(
        "batch",
        "n_pairs",
        F.round("b_grad", 6).alias("b_grad"),
        F.round("abs_missed_sum", 6).alias("abs_missed_sum"),
        F.round("g0", 6).alias("g0"),
        F.round("g1", 6).alias("g1"),
    )


# ---------------------------------------------------------------------------
# Window functions & sorts/top-k (SURVEY.md §2.5, §2.6)
# ---------------------------------------------------------------------------

@_register(
    "window_running_sum",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running
    FROM events
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = _load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("running")
    )


@_register(
    "topk_per_group",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = _load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


@_register(
    "topk_global",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MBH top-N selection (src/mbh.c:144-187) → TakeOrderedAndProject,
    deterministic tie-break by key."""
    return (
        _load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY.md §2.7)
# ---------------------------------------------------------------------------

@_register(
    "set_ops_union_except",
    """
    SELECT doc_id FROM (
      SELECT doc_id FROM documents WHERE lang = 'en'
      UNION
      SELECT doc_id FROM documents WHERE n_chars > 300
    )
    EXCEPT
    SELECT doc_id FROM documents WHERE source = 'src1'
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _load(spark, sf_dir, "documents")
    u = d.filter(F.col("lang") == "en").select("doc_id").union(
        d.filter(F.col("n_chars") > 300).select("doc_id")
    ).distinct()
    return u.exceptAll(d.filter(F.col("source") == "src1").select("doc_id")).distinct()


@_register(
    "pair_dedup_normalized",
    """
    SELECT DISTINCT least(user_id, CAST(floor(value) AS BIGINT)) AS a,
                    greatest(user_id, CAST(floor(value) AS BIGINT)) AS b
    FROM events WHERE event_type = 'click' AND user_id <> CAST(floor(value) AS BIGINT)
    """,
)
def q_pair_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric pair dedup on (least, greatest) — negative-edge dedup
    (updateNegativeMatches src/myMatches.c:219-228, check_info_list
    src/functs.c:1883-1928)."""
    ev = _load(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    # floor() explicitly: DuckDB's double→bigint cast rounds, Spark truncates
    v = F.floor("value").cast("bigint")
    return (
        ev.filter(F.col("user_id") != v)
        .select(F.least("user_id", v).alias("a"), F.greatest("user_id", v).alias("b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Scalar functions (SURVEY.md §2.8)
# ---------------------------------------------------------------------------

@_register(
    "scalar_string_funcs",
    """
    SELECT doc_id, lower(substr(text, 1, 20)) AS prefix20,
           length(text) AS len, length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
           md5(lang) AS lang_fp
    FROM documents
    """,
)
def q_scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lower(F.substring("text", 1, 20)).alias("prefix20"),
        F.length("text").alias("len"),
        F.length(F.regexp_replace("text", "[^a-z]", "")).alias("n_alpha"),
        F.md5("lang").alias("lang_fp"),
    )


@_register(
    "scalar_portable_hash",
    f"SELECT doc_id, {X.portable_hash_sql('text')} AS h FROM documents",
)
def q_portable_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's cross-engine string hash (re-expression of hash1,
    src/myHash.c:47-62) — MinHash/SimHash building block."""
    return _load(spark, sf_dir, "documents").select(
        "doc_id", X.portable_hash(F.col("text")).alias("h")
    )


@_register(
    "scalar_levenshtein",
    """
    SELECT d1.doc_id AS a, d2.doc_id AS b,
           levenshtein(substr(d1.text, 1, 64), substr(d2.text, 1, 64)) AS dist
    FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
    WHERE d1.doc_id % 20 = 0
    """,
)
def q_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _load(spark, sf_dir, "documents").select("doc_id", F.substring("text", 1, 64).alias("p"))
    d1 = d.filter(F.col("doc_id") % 20 == 0).select(F.col("doc_id").alias("a"), F.col("p").alias("pa"))
    d2 = d.select((F.col("doc_id") - 1).alias("a"), F.col("doc_id").alias("b"), F.col("p").alias("pb"))
    return (
        d1.join(d2, "a")
        .select("a", "b", F.levenshtein("pa", "pb").alias("dist"))
    )


# ---------------------------------------------------------------------------
# MinHash / LSH / dedup family (SURVEY.md §2.3 blocking + pipeline extensions)
# ---------------------------------------------------------------------------

_SHINGLES_SQL = X.shingles_sql(X.tokenize_sql("text"), 2)

@_register(
    "minhash_signatures",
    f"""
    SELECT doc_id,
           {', '.join(
               f"list_extract({H.minhash_signature_sql('__sh', 8)}, {i + 1}) AS mh{i}"
               for i in range(8)
           )}
    FROM (SELECT doc_id, {_SHINGLES_SQL} AS __sh FROM documents)
    """,
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature components (blocking re-expression of hash-bucket
    assignment, src/myHash.c:47-62). 8 perms exposed as scalar columns."""
    d = _load(spark, sf_dir, "documents")
    sig = H.minhash_signature(X.shingles(X.tokenize("text"), 2), num_perm=8)
    return d.select(
        "doc_id", *[F.element_at(sig, i + 1).alias(f"mh{i}") for i in range(8)]
    )


@_register(
    "dedup_exact",
    """
    WITH u AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id + 1000000, text FROM documents
    ), g AS (
      SELECT md5(text) AS fp, count(*) AS n_dups, list_sort(list(doc_id)) AS ids
      FROM u GROUP BY md5(text) HAVING count(*) > 1
    )
    SELECT fp, n_dups, unnest(ids) AS doc_id FROM g
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over a corpus with guaranteed duplicates: the corpus is
    self-unioned under shifted ids (deterministic), so the oracle check is
    non-vacuous (r01 passed on 0=0 rows). Output exploded to one row per
    duplicate-group member (driver canonicalizer can't hash ARRAY cells)."""
    from bigdataentityresolution_spark.operators.dedup import exact_duplicates

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(1000000))
    )
    return exact_duplicates(dup).select(
        "fp", "n_dups", F.explode("doc_ids").alias("doc_id")
    )


@_register(
    "dedup_ngram_jaccard",
    """
    WITH base AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 4 = 0
    ), u AS (
      SELECT doc_id, lang, text FROM base
      UNION ALL SELECT doc_id + 1000000, lang, text FROM base
    ), sh AS (
      SELECT doc_id, lang, list_distinct({sh}) AS s FROM u
    )
    SELECT a.doc_id AS a, b.doc_id AS b,
           round(len(list_intersect(a.s, b.s)) * 1.0 /
                 len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s)) * 1.0 /
          len(list_distinct(list_concat(a.s, b.s))) >= 0.2
    """.format(sh=_SHINGLES_SQL),
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs over lang-blocked candidates.

    The sampled corpus is self-unioned under shifted ids so duplicate
    pairs exist by construction — the r01 oracle passed vacuously (0=0)."""
    from bigdataentityresolution_spark.functions.similarity import jaccard_arrays

    base = (
        _load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 0)
        .select("doc_id", "lang", "text")
    )
    d = (
        base.unionByName(base.withColumn("doc_id", F.col("doc_id") + F.lit(1000000)))
        .select(
            "doc_id", "lang",
            F.array_distinct(X.shingles(X.tokenize("text"), 2)).alias("s"),
        )
    )
    a = d.select(F.col("doc_id").alias("a"), "lang", F.col("s").alias("sa"))
    b = d.select(F.col("doc_id").alias("b"), "lang", F.col("s").alias("sb"))
    return (
        a.join(b, "lang")
        .filter(F.col("a") < F.col("b"))
        .withColumn("jaccard", F.round(jaccard_arrays("sa", "sb"), 6))
        .filter(F.col("jaccard") >= 0.2)
        .select("a", "b", "jaccard")
    )


@_register(
    "dedup_simhash",
    f"""
    WITH u AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id + 1000000, text FROM documents
    ),{H.simhash_sql_ctes("u", "doc_id", X.tokenize_sql("text"))}
    SELECT CAST(a.doc_id AS VARCHAR) AS a, CAST(b.doc_id AS VARCHAR) AS b,
           CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
    FROM _sh a JOIN _sh b ON CAST(a.doc_id AS VARCHAR) < CAST(b.doc_id AS VARCHAR)
    WHERE bit_count(xor(a.s, b.s)) <= 3
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs vs a BRUTE-FORCE hamming oracle: DuckDB
    recomputes every 60-bit fingerprint (same token hashes, same bit
    votes) and enumerates ALL pairs with hamming ≤ 3 — so the check
    covers both fingerprint parity and banding recall (guaranteed by
    pigeonhole: hamming < n_chunks ⇒ a shared chunk). Self-union under
    shifted ids makes hamming-0 pairs exist by construction (r01 row
    was rows-only AND the banding at max_hamming=12 could miss pairs)."""
    from bigdataentityresolution_spark.operators.dedup import simhash_duplicate_pairs

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    u = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + F.lit(1000000)))
    return simhash_duplicate_pairs(u, max_hamming=3).select(
        "a", "b", F.col("hamming").cast("int").alias("hamming")
    )


@_register(
    "dedup_minhash_lsh",
    """
    WITH sh AS (
      SELECT CAST(doc_id AS VARCHAR) AS id, list_distinct({sh}) AS s
      FROM documents
    )
    SELECT a.id AS a, b.id AS b,
           round(len(list_intersect(a.s, b.s)) * 1.0 /
                 len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.id < b.id
    WHERE len(list_intersect(a.s, b.s)) * 1.0 /
          len(list_distinct(list_concat(a.s, b.s))) >= 0.7
    """.format(sh=_SHINGLES_SQL),
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified by exact shingle Jaccard.

    The oracle is BRUTE-FORCE exact Jaccard over all pairs — so this
    checks LSH *recall* too: at threshold 0.7 with 16 bands x 2 rows,
    P(miss) = (1-J^2)^16 <= 2.1e-5 per pair, and the fixed seeds make
    the outcome deterministic (verified equal at sf0.01)."""
    from bigdataentityresolution_spark.operators.dedup import minhash_duplicate_pairs

    return minhash_duplicate_pairs(
        _load(spark, sf_dir, "documents"),
        id_col="doc_id",
        text_col="text",
        shingle_n=2,
        jaccard_threshold=0.7,
    )


@_register(
    "dedup_embedding_cosine",
    """
    WITH u AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL SELECT vec_id + 1000000, embedding FROM embeddings
    ), emb AS (SELECT CAST(vec_id AS VARCHAR) AS id,
                      CAST(embedding AS DOUBLE[]) AS v FROM u)
    SELECT a.id AS a, b.id AS b,
           round(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                 6) AS cosine
    FROM emb a JOIN emb b ON a.id < b.id
    WHERE list_dot_product(a.v, b.v) /
          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.9
    """,
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH, verified by
    exact cosine — oracle is brute force, so LSH recall is checked.

    The corpus is self-unioned under shifted ids (identical copies ⇒
    cosine 1.0 pairs by construction) so the check is non-vacuous; pair
    orientation is lexicographic on the STRING ids on BOTH sides (the r01
    oracle ordered numerically — latent mismatch, ADVICE.md)."""
    from bigdataentityresolution_spark.operators.dedup import embedding_near_dup_pairs

    emb = _load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    u = emb.unionByName(emb.withColumn("vec_id", F.col("vec_id") + F.lit(1000000)))
    # dim passed explicitly (module constant, resolved at call time) so the
    # operator never runs its driver-side F.size(...).first() probe — the
    # last plan-break in a registered query (VERDICT r3 'What's wrong' #1).
    return embedding_near_dup_pairs(u, cosine_threshold=0.9, dim=_EMB_DIM)


@_register(
    "dedup_keep_first",
    """
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep
    FROM documents
    """,
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection: connected components over exact-dup pairs;
    min id per component survives. Oracle: min-per-md5-group window."""
    from bigdataentityresolution_spark.operators.dedup import dedup_keep_first

    docs = _load(spark, sf_dir, "documents")
    fp = docs.select(F.md5("text").alias("fp"), F.col("doc_id").cast("string").alias("id"))
    a = fp.select("fp", F.col("id").alias("a"))
    b = fp.select("fp", F.col("id").alias("b"))
    dup_pairs = a.join(b, "fp").filter(F.col("a") < F.col("b")).select("a", "b")
    return dedup_keep_first(dup_pairs, docs, id_col="doc_id")


# ---------------------------------------------------------------------------
# Similarity search / embeddings (pipeline extensions)
# ---------------------------------------------------------------------------

@_register(
    "ann_cosine_topk",
    """
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id,
             list_dot_product(q.v, c.v) /
               (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos_raw
      FROM emb q, emb c WHERE q.vec_id < 8
    )
    SELECT query_id, vec_id, round(cos_raw, 6) AS cosine, CAST(rnk AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY round(cos_raw, 6) DESC, vec_id ASC
      ) AS rnk FROM scored
    ) WHERE rnk <= 5
    """,
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the ANN baseline) — 8 probes vs corpus."""
    from bigdataentityresolution_spark.operators.ann import brute_force_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(emb, queries, k=5)


def _sql_dot(vec_expr: str, row) -> str:
    """list_dot_product(vec, [literal doubles]) — Python repr round-trips
    each double exactly, so DuckDB parses the bit-identical constant the
    Spark plan carries via F.lit."""
    lits = ", ".join(repr(float(x)) for x in row)
    return f"list_dot_product({vec_expr}, [{lits}])"


def _lsh_keys_sql(vec_expr: str, n_planes: int, bands: int, seed: int, dim: int) -> str:
    """DuckDB twin of ann._hyperplane_bits + band-key assembly: the SAME
    numpy-generated hyperplanes (ann.hyperplanes is the single source of
    truth) embedded as SQL literals."""
    from bigdataentityresolution_spark.operators.ann import hyperplanes

    planes = hyperplanes(n_planes, dim, seed)
    rows_per_band = n_planes // bands
    bits = [
        f"(CASE WHEN {_sql_dot(vec_expr, planes[i])} >= 0 THEN 1 ELSE 0 END)"
        for i in range(n_planes)
    ]
    keys = []
    for b in range(bands):
        elems = " || '_' || ".join(
            f"CAST({bits[b * rows_per_band + r]} AS VARCHAR)" for r in range(rows_per_band)
        )
        keys.append(f"('{b}' || ':' || ({elems}))")
    return "[" + ", ".join(keys) + "]"


_EMB_DIM = 64  # driver-correctness corpus (testdata embeddings.parquet)

@_register(
    "ann_lsh_topk",
    f"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    ck AS (SELECT vec_id, unnest({{keys}}) AS bk FROM emb),
    qk AS (SELECT vec_id AS query_id, unnest({{keys}}) AS bk FROM emb WHERE vec_id < 8),
    cand AS (SELECT DISTINCT qk.query_id, ck.vec_id FROM ck JOIN qk USING (bk)),
    scored AS (
      SELECT c.query_id, c.vec_id,
             round(list_dot_product(q.v, e.v) /
                   (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))),
                   6) AS cosine
      FROM cand c JOIN emb e ON c.vec_id = e.vec_id JOIN emb q ON c.query_id = q.vec_id
    )
    SELECT query_id, vec_id, cosine, CAST(rnk AS INT) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rnk
          FROM scored)
    WHERE rnk <= 5
    """.format(keys=_lsh_keys_sql("v", 16, 8, 42, _EMB_DIM)),
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH cosine top-k vs a FULL-ALGORITHM DuckDB twin: the oracle
    reproduces the hyperplane sign bits (same numpy constants as SQL
    literals), band-key join, candidate dedup, and ranked top-k — so
    the r01 rows-only gap is closed with exact parity, bucketing
    included."""
    from bigdataentityresolution_spark.operators.ann import lsh_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(emb, queries, k=5, dim=_EMB_DIM)


def _ivf_cells_sql() -> str:
    from bigdataentityresolution_spark.operators.ann import ivf_centroids

    cents = ivf_centroids(16, _EMB_DIM, 42)
    return " UNION ALL ".join(
        f"SELECT vec_id, v, {i} AS cell, round({_sql_dot('v', cents[i])}, 9) AS s FROM emb"
        for i in range(16)
    )


@_register(
    "ann_ivf_topk",
    f"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cellscores AS (
      {_ivf_cells_sql()}
    ),
    assign AS (
      SELECT vec_id, v, cell FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY s DESC, cell DESC) AS rn
        FROM cellscores) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, v AS qv, cell FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY s DESC, cell DESC) AS rn
        FROM cellscores WHERE vec_id < 8) WHERE rn <= 4
    ),
    scored AS (
      SELECT p.query_id, a.vec_id,
             round(list_dot_product(p.qv, a.v) /
                   (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))),
                   6) AS cosine
      FROM probes p JOIN assign a USING (cell)
    )
    SELECT query_id, vec_id, cosine, CAST(rnk AS INT) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rnk
          FROM scored)
    WHERE rnk <= 5
    """,
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantization top-k vs a full-algorithm DuckDB twin:
    same centroid constants, same argmax cell assignment (ties → higher
    cell, mirroring Spark's struct array_max), same n_probe=4 probe set,
    same ranked top-k. Registers the r01 'implemented, pytest only' op
    as a driver-checked query."""
    from bigdataentityresolution_spark.operators.ann import ivf_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=4, dim=_EMB_DIM)


# ---------------------------------------------------------------------------
# Spec-JSON ingestion (SURVEY.md §2.1 — readDataset/readFile)
# ---------------------------------------------------------------------------

_SPEC_JSON_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "spec_json",
)

@_register(
    "spec_json_ingest",
    f"""
    WITH raw AS (
      SELECT * FROM read_json_auto('{_SPEC_JSON_DIR}/*/*.json', filename=true)
    ), specs AS (
      SELECT split_part(filename, '/', -2) || '//' ||
             regexp_replace(split_part(filename, '/', -1), '\\.json$', '') AS spec_id,
             concat_ws(' ',
               CASE WHEN "page title" IS NOT NULL THEN 'page title' END,
               CASE WHEN brand IS NOT NULL THEN 'brand' END,
               CASE WHEN features IS NOT NULL AND len(features) > 0 THEN 'features' END,
               CASE WHEN battery IS NOT NULL THEN 'battery' END,
               "page title", brand, array_to_string(features, ' '), battery) AS kv_text
      FROM raw
    )
    SELECT spec_id, unnest({X.admitted_tokens_sql('kv_text')}) AS token FROM specs
    """,
)
def q_spec_json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readDataset/readFile parity over a committed spec-JSON fixture
    (reference src/functs.c:33-489): per-site directories, specID =
    site//file (src/functs.c:111-117), scalar-or-array property
    normalization to MAP<STRING,ARRAY<STRING>>, then checkWord token
    admission over keys AND values (src/boWords.c:202-226). The oracle
    re-derives the same (spec_id, token) multiset from the raw JSON in
    DuckDB. sf_dir is unused — the fixture is the dataset."""
    from bigdataentityresolution_spark.sources.readers import (
        read_spec_json,
        spec_properties_tokens,
    )

    specs = read_spec_json(spark, os.path.join(_SPEC_JSON_DIR, "*", "*.json"))
    return spec_properties_tokens(specs)


# ---------------------------------------------------------------------------
# Connected components (SURVEY.md §2.7 cluster union → large-star/small-star)
# ---------------------------------------------------------------------------

@_register(
    "connected_components_chains",
    """
    WITH RECURSIVE e AS (
      SELECT d1.doc_id AS a, d2.doc_id AS b
      FROM documents d1 JOIN documents d2
        ON d2.doc_id = d1.doc_id + 1 AND d1.lang = d2.lang
    ), sym AS (
      SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e
    ), reach(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT s.a, r.lbl FROM sym s JOIN reach r ON s.b = r.node
    )
    SELECT node AS spec_id, min(lbl) AS cluster_id FROM reach GROUP BY node
    """,
)
def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """large-star/small-star CC vs a recursive-CTE oracle. Edge set:
    consecutive doc_ids sharing a language (deterministic chains)."""
    from bigdataentityresolution_spark.operators.clustering import connected_components

    d = _load(spark, sf_dir, "documents").select("doc_id", "lang")
    d2 = d.select((F.col("doc_id") - 1).alias("doc_id"), F.col("lang").alias("lang2"), F.col("doc_id").alias("b"))
    edges = (
        d.join(d2, "doc_id")
        .filter(F.col("lang") == F.col("lang2"))
        .select(F.col("doc_id").alias("a"), "b")
    )
    return connected_components(edges, nodes=d.select("doc_id"))


# ---------------------------------------------------------------------------
# Pair sinks (SURVEY.md §2.1 — the program's actual output relations:
# extractMatches / extractNegatives, reference src/myMatches.c:255-405)
# ---------------------------------------------------------------------------

# Shared oracle scaffold: recursive-CTE connected components over the
# deterministic chain edges (consecutive doc_ids sharing a language) —
# the same closure the green `connected_components_chains` row verifies.
_CHAIN_LABELS_CTE = """
    WITH RECURSIVE e AS (
      SELECT d1.doc_id AS a, d2.doc_id AS b
      FROM documents d1 JOIN documents d2
        ON d2.doc_id = d1.doc_id + 1 AND d1.lang = d2.lang
    ), sym AS (
      SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e
    ), reach(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT s.a, r.lbl FROM sym s JOIN reach r ON s.b = r.node
    ), lab AS (
      SELECT node AS spec_id, min(lbl) AS cluster_id FROM reach GROUP BY node
    )
"""


def _chain_labeled_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic labeled-pairs relation over documents: consecutive
    doc_ids are labeled 1 (match) when they share a language, 0
    (cannot-link) otherwise — gives the closure a non-trivial mix of
    must-link chains and cross-cluster negative edges."""
    d = _load(spark, sf_dir, "documents").select("doc_id", "lang")
    nxt = d.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.col("lang").alias("lang2"),
        F.col("doc_id").alias("right_spec_id"),
    )
    return (
        d.join(nxt, "doc_id")
        .select(
            F.col("doc_id").alias("left_spec_id"),
            "right_spec_id",
            F.when(F.col("lang") == F.col("lang2"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("label"),
        )
    )


@_register(
    "pair_sink_matches",
    _CHAIN_LABELS_CTE
    + """
    SELECT l1.spec_id AS a, l2.spec_id AS b, CAST(1 AS INT) AS label
    FROM lab l1 JOIN lab l2
      ON l1.cluster_id = l2.cluster_id AND l1.spec_id < l2.spec_id
    """,
)
def q_pair_sink_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The positives sink (extractMatches, src/myMatches.c:255-330): full
    transitive-closure expansion of the label closure into (a, b, 1)
    within-cluster pairs — verified against a recursive-CTE + self-join
    DuckDB oracle over the same deterministic chain labels."""
    from bigdataentityresolution_spark.operators.clustering import (
        closure_from_labeled_pairs,
        extract_matches,
    )

    d = _load(spark, sf_dir, "documents").select("doc_id")
    labels, _neg = closure_from_labeled_pairs(
        _chain_labeled_pairs(spark, sf_dir), nodes=d
    )
    return extract_matches(labels)


@_register(
    "pair_sink_negatives",
    _CHAIN_LABELS_CTE
    + """
    , negraw AS (
      SELECT d1.doc_id AS l, d2.doc_id AS r
      FROM documents d1 JOIN documents d2
        ON d2.doc_id = d1.doc_id + 1 AND d1.lang <> d2.lang
    ), nedges AS (
      SELECT DISTINCT least(la.cluster_id, lb.cluster_id) AS cid_a,
                      greatest(la.cluster_id, lb.cluster_id) AS cid_b
      FROM negraw JOIN lab la ON la.spec_id = negraw.l
                  JOIN lab lb ON lb.spec_id = negraw.r
      WHERE la.cluster_id <> lb.cluster_id
    )
    SELECT DISTINCT least(ma.spec_id, mb.spec_id) AS a,
                    greatest(ma.spec_id, mb.spec_id) AS b,
                    CAST(0 AS INT) AS label
    FROM nedges JOIN lab ma ON ma.cluster_id = nedges.cid_a
                JOIN lab mb ON mb.cluster_id = nedges.cid_b
    """,
)
def q_pair_sink_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The negatives sink (extractNegatives, src/myMatches.c:332-405):
    members(cid_a) × members(cid_b) for every cannot-link cluster edge,
    normalized a<b and deduplicated — the oracle remaps the raw label-0
    pairs through the recursive-CTE labels and expands identically."""
    from bigdataentityresolution_spark.operators.clustering import (
        closure_from_labeled_pairs,
        extract_negatives,
    )

    d = _load(spark, sf_dir, "documents").select("doc_id")
    labels, neg_edges = closure_from_labeled_pairs(
        _chain_labeled_pairs(spark, sf_dir), nodes=d
    )
    return extract_negatives(labels, neg_edges)


@_register(
    "strong_matches",
    f"""
    WITH toks AS (
      SELECT doc_id, list_distinct({X.tokenize_sql('text')}) AS t FROM documents
    ), pairs AS (
      SELECT a.doc_id AS a, b.doc_id AS b, a.t AS ta, b.t AS tb
      FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
      UNION ALL
      SELECT doc_id AS a, doc_id + 1000000 AS b, t AS ta, t AS tb FROM toks
    ), j AS (
      SELECT a, b,
        round(CASE WHEN len(list_distinct(list_concat(ta, tb))) = 0 THEN 0.0
              ELSE len(list_intersect(ta, tb)) * 1.0 /
                   len(list_distinct(list_concat(ta, tb))) END, 9) AS jac
      FROM pairs
    )
    SELECT a, b, round(1.0 / (1.0 + exp(-(8.0 * jac - 3.0))), 6) AS proba
    FROM j
    WHERE round(1.0 / (1.0 + exp(-(8.0 * jac - 3.0))), 6) >= 0.85
    """,
)
def q_strong_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strong-matches sink (getStrongMatches — disabled in the reference
    build, SURVEY.md §2.1 / src/functs.c:2137-2199): scored pairs above
    the 0.85 confidence floor. Scores are a deterministic sigmoid over
    token-set Jaccard of (consecutive-doc ∪ self-copy) pairs, so the
    floor filters a known mix: self-copies (J=1, proba≈0.993) pass,
    chain pairs mostly don't — the sink's filter semantics are exercised
    non-vacuously."""
    from bigdataentityresolution_spark.functions.similarity import jaccard_arrays
    from bigdataentityresolution_spark.operators.clustering import (
        extract_strong_matches,
    )

    d = _load(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(X.tokenize("text")).alias("toks")
    )
    left = d.select(F.col("doc_id").alias("a"), F.col("toks").alias("ta"))
    right = d.select(
        (F.col("doc_id") - 1).alias("a"),
        F.col("doc_id").alias("b"),
        F.col("toks").alias("tb"),
    )
    consec = left.join(right, "a")
    dup = d.select(
        F.col("doc_id").alias("a"),
        (F.col("doc_id") + F.lit(1000000)).alias("b"),
        F.col("toks").alias("ta"),
        F.col("toks").alias("tb"),
    )
    pairs = consec.select("a", "b", "ta", "tb").unionByName(
        dup.select("a", "b", "ta", "tb")
    )
    jac = F.round(jaccard_arrays(F.col("ta"), F.col("tb")), 9)
    proba = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(8.0) * jac - F.lit(3.0)))), 6
    )
    scored = pairs.select("a", "b", proba.alias("proba"))
    return extract_strong_matches(scored, proba_floor=0.85)


# ---------------------------------------------------------------------------
# Text analytics (training-data pipeline extensions)
# ---------------------------------------------------------------------------

def _lang_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in sorted(X._LANG_MARKERS[lang]))
    return (
        f"len(list_filter({X.tokenize_sql('text')}, t -> list_contains([{words}], t)))"
    )


@_register(
    "text_lang_id",
    f"""
    SELECT doc_id,
      CASE WHEN h_zh = 0 AND h_es = 0 AND h_fr = 0 AND h_en = 0 AND h_de = 0 THEN 'und'
           WHEN h_zh >= h_es AND h_zh >= h_fr AND h_zh >= h_en AND h_zh >= h_de THEN 'zh'
           WHEN h_es >= h_fr AND h_es >= h_en AND h_es >= h_de THEN 'es'
           WHEN h_fr >= h_en AND h_fr >= h_de THEN 'fr'
           WHEN h_en >= h_de THEN 'en'
           ELSE 'de' END AS lang_pred
    FROM (
      SELECT doc_id,
             {_lang_hits_sql('de')} AS h_de, {_lang_hits_sql('en')} AS h_en,
             {_lang_hits_sql('es')} AS h_es, {_lang_hits_sql('fr')} AS h_fr,
             {_lang_hits_sql('zh')} AS h_zh
      FROM documents
    )
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-heuristic language ID (argmax marker hits, ties → max lang)."""
    return _load(spark, sf_dir, "documents").select(
        "doc_id", X.lang_id("text").alias("lang_pred")
    )


@_register(
    "text_quality_score",
    f"""
    SELECT doc_id, round(
        0.4 * least(len({X.tokenize_sql('text')}) / 100.0, 1.0)
      + 0.3 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / greatest(length(text), 1))
      + 0.3 * least(
          len(list_filter({X.tokenize_sql('text')}, t -> list_contains([{', '.join(chr(39) + w + chr(39) for w in X.STOPWORDS)}], t)))
            * 1.0 / greatest(len({X.tokenize_sql('text')}), 1) * 5.0, 1.0), 6) AS quality
    FROM documents
    """,
)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _load(spark, sf_dir, "documents").select(
        "doc_id", X.quality_score("text").alias("quality")
    )


# ---------------------------------------------------------------------------
# Streaming-as-batch: tumbling window agg over events
# ---------------------------------------------------------------------------

@_register(
    "events_tumbling_window",
    """
    SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS win_start, event_type,
           count(*) AS n, round(sum(value), 4) AS total
    FROM events GROUP BY 1, 2
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-min window aggregate — batch semantics of the
    streaming ingest path (streaming/ingest.py runs the same plan via
    readStream; the reference has no streaming, SURVEY.md §2.11)."""
    ev = _load(spark, sf_dir, "events")
    return ev.groupBy(
        F.window("ts", "5 minutes").getField("start").alias("win_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))


# ---------------------------------------------------------------------------
# Multimodal columns (binary payload + typed metadata; SURVEY-extension)
# ---------------------------------------------------------------------------

def _media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table synthesized from documents: payload =
    utf-8 bytes of the text, modality cycles by doc_id. Exercises the
    real BINARY-column plumbing without container codecs."""
    docs = _load(spark, sf_dir, "documents")
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        modality.alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


@_register(
    "multimodal_media_stats",
    """
    SELECT modality, count(*) AS n,
           CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
           CAST(round(avg(strlen(text)), 2) AS DOUBLE) AS avg_bytes
    FROM (SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                 ELSE 'video' END AS modality, text FROM documents)
    GROUP BY modality
    """,
)
def q_multimodal_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only media aggregates over BINARY payloads (no decode);
    oracle reproduces byte lengths from the source text (ascii corpus)."""
    from bigdataentityresolution_spark.operators.multimodal import media_stats

    return media_stats(_media_from_documents(spark, sf_dir))


@_register(
    "multimodal_features",
    """
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS modality,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           sha256(text) AS payload_sha
    FROM documents
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow mapInPandas decode plumbing: per-item bytes + sha256 digest
    (the stubbed-decoder feature vector itself is excluded — the oracle
    checks the REAL columns: sizes and content digests)."""
    from bigdataentityresolution_spark.operators.multimodal import extract_media_features

    media = _media_from_documents(spark, sf_dir)
    return extract_media_features(media).select(
        "media_id", "modality", "n_bytes", "payload_sha"
    )


@_register(
    "multimodal_frame_sample",
    """
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(frame_idx * 1000 AS BIGINT) AS ts_ms
    FROM (SELECT doc_id, strlen(text) * 10 AS duration_ms FROM documents
          WHERE doc_id % 3 = 2),
         LATERAL (SELECT unnest(range(0, greatest(CAST(floor(duration_ms / 1000.0) AS INT), 1)))
                  AS frame_idx)
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: one row per sampled timestamp from the
    typed duration metadata (decode stubbed; plumbing real)."""
    from bigdataentityresolution_spark.operators.multimodal import frame_sample_plan

    plan = frame_sample_plan(_media_from_documents(spark, sf_dir), every_ms=1000)
    return plan.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("ts_ms").cast("long").alias("ts_ms"),
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
