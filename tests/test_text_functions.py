"""Unit tests for functions.text / functions.hashes vs pure-Python oracles."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bigdataentityresolution_spark.functions import hashes as H
from bigdataentityresolution_spark.functions import text as X


def py_portable_hash(s: str, seed: int = 0) -> int:
    acc = X.HASH_INIT + seed
    for ch in s:
        acc = (acc * 31 + ord(ch)) % X.HASH_PRIME
    return acc


def py_hash1(key: str) -> int:
    # reference src/myHash.c:47-62
    import math

    s, extra = 1, 0
    for t, ch in enumerate(key):
        s += ord(ch) - ord("0") + extra
        # C (and Spark/Java) % truncates toward zero — not Python's floored %
        extra += int(math.fmod(ord(ch) - ord("0"), t + 1))
    return s


SAMPLES = ["hello world", "a", "", "mpla17", "def init_buffer(x, y):", "word0 word1"]


def test_portable_hash_matches_python_and_duckdb(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", X.portable_hash(F.col("s")).alias("h")).collect()
    }
    for s in SAMPLES:
        assert got[s] == py_portable_hash(s), s
    duck = duckdb.sql(
        f"select s, {X.portable_hash_sql('s')} as h from (select unnest($samples) as s)",
        params={"samples": SAMPLES},
    ).fetchall()
    for s, h in duck:
        assert h == py_portable_hash(s), f"duckdb mismatch on {s!r}"


def test_hash1_compat(spark):
    keys = ["mpla0", "mpla17", "www.ebay.com//4233", "a"]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {r["k"]: r["h"] for r in df.select("k", X.hash1_compat(F.col("k")).alias("h")).collect()}
    for k in keys:
        assert got[k] == py_hash1(k), k


def test_admitted_tokens_reference_semantics(spark):
    df = spark.createDataFrame(
        [("The Quick brown-fox jumps OVER the lazy dog123 and a!b",)], "t string"
    )
    (row,) = df.select(X.admitted_tokens(F.col("t")).alias("toks")).collect()
    # "The"/"the"/"and" are stopwords; "brown-fox"/"a!b" not alnum; rest kept.
    assert row["toks"] == ["quick", "jumps", "over", "lazy", "dog123"]


def test_tokenize_and_shingles(spark):
    df = spark.createDataFrame([("def foo(x): return x+1",), ("ab",)], "t string")
    out = df.select(
        X.tokenize("t").alias("toks"),
        X.shingles(X.tokenize("t"), 3).alias("sh3"),
    ).collect()
    assert out[0]["toks"] == ["def", "foo", "x", "return", "x", "1"]
    assert out[0]["sh3"][0] == "def foo x"
    assert len(out[0]["sh3"]) == 4
    # short doc: single shingle of everything
    assert out[1]["sh3"] == ["ab"]


def test_minhash_signature_deterministic_and_similarity(spark):
    a = "the quick brown fox jumps over the lazy dog " * 3
    b = a.replace("fox", "cat")
    c = "completely different words entirely unrelated content here"
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], "id long, t string")
    sig = H.minhash_signature(X.shingles(X.tokenize("t"), 2), num_perm=32)
    rows = {r["id"]: r["sig"] for r in df.select("id", sig.alias("sig")).collect()}
    matches_ab = sum(x == y for x, y in zip(rows[1], rows[2]))
    matches_ac = sum(x == y for x, y in zip(rows[1], rows[3]))
    assert matches_ab > matches_ac
    # shingle-Jaccard(a,b) ≈ 0.64 → expect ~20/32 component agreement;
    # allow generous variance, require far above unrelated-pair level.
    assert matches_ab >= 10
    assert matches_ac <= 4


def test_minhash_matches_duckdb_oracle(spark):
    texts = ["alpha beta gamma delta", "alpha beta gamma epsilon zeta"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    sig_col = H.minhash_signature(X.shingles(X.tokenize("t"), 2), num_perm=8)
    spark_rows = [r["sig"] for r in df.select(sig_col.alias("sig")).collect()]
    sh_sql = X.shingles_sql(X.tokenize_sql("t"), 2)
    sig_sql = H.minhash_signature_sql(sh_sql, num_perm=8)
    duck_rows = [
        r[0]
        for r in duckdb.sql(
            f"select {sig_sql} from (select unnest($t) as t)", params={"t": texts}
        ).fetchall()
    ]
    assert spark_rows == duck_rows


def test_lsh_band_keys_shape(spark):
    df = spark.createDataFrame([("alpha beta gamma delta epsilon",)], "t string")
    sig = H.minhash_signature(X.shingles(X.tokenize("t"), 2), num_perm=8)
    keys = H.lsh_band_keys(sig, bands=4, rows_per_band=2)
    (row,) = df.select(keys.alias("k")).collect()
    assert len(row["k"]) == 4
    assert all(k.split(":")[0] == str(i) for i, k in enumerate(row["k"]))


def test_simhash_near_dup_small_hamming(spark):
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = a.replace("dog", "cat")
    c = "totally unrelated text about spark shuffles and parquet files"
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], "id long, t string")
    sh = df.select("id", H.simhash64(X.tokenize("t")).alias("s")).collect()
    s = {r["id"]: r["s"] for r in sh}
    df2 = spark.createDataFrame(
        [(s[1], s[2]), (s[1], s[3])], "x long, y long"
    ).select(H.hamming64(F.col("x"), F.col("y")).alias("d"))
    d_ab, d_ac = [r["d"] for r in df2.collect()]
    assert d_ab < d_ac


def test_lang_id_and_quality(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat with the dog and the fox",),
            ("der hund ist nicht mit der katze und das haus",),
            ("xyzzy qwerty 12345",),
        ],
        "t string",
    )
    rows = df.select(X.lang_id("t").alias("lang"), X.quality_score("t").alias("q")).collect()
    assert rows[0]["lang"] == "en"
    assert rows[1]["lang"] == "de"
    assert rows[2]["lang"] == "und"
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)
