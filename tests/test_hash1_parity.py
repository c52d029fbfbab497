"""hash1 block-parity goldens: the Spark expression `hash1_compat`
(functions/text.py) must reproduce the reference's hash1
(/root/reference/src/myHash.c:47-62) bit-for-bit — the north rule draws
labeled pairs "at the same blocking key", so block identity must match.

Goldens were derived by executing the reference algorithm independently
(sum=1; extra=0; per char c at 0-based pos t: sum += c-'0'+extra;
extra += (c-'0') % (t+1)) over the key shapes the reference's own unit
test uses ("mpla<i>", tests/myHash_test.c:46-66) plus spec-id shapes
(site//file, src/functs.c:111-117). Values are HARDCODED so a broken
reimplementation on either side fails loudly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataentityresolution_spark.functions.text import hash1_compat

# key -> reference hash1(key)
GOLDENS = {
    "mpla0": 236,
    "mpla1": 237,
    "mpla42": 247,
    "mpla99": 259,
    "www.shop.com//7": 718,
    "buy.net//10": 429,
    "0": 1,
    "9": 10,
    "spec": 238,
}


def _hash1_c(key: str) -> int:
    """Independent transcription of the C loop (test oracle only).

    C's % truncates toward zero; Python's floors — chars below '0'
    ('.', '/') make (c - '0') negative, so the modulo must be done with
    C semantics or site//file keys diverge."""
    s, extra = 1, 0
    for t, ch in enumerate(key):
        d = ord(ch) - 48
        s += d + extra
        r = abs(d) % (t + 1)
        extra += -r if d < 0 else r
    return s


def test_goldens_self_consistent():
    # guards the hardcoded table against transcription typos
    for k, v in GOLDENS.items():
        assert _hash1_c(k) == v, k


def test_hash1_compat_matches_reference_goldens(spark):
    df = spark.createDataFrame([(k,) for k in GOLDENS], "key string")
    got = {r["key"]: r["h"] for r in df.select("key", hash1_compat(F.col("key")).alias("h")).collect()}
    assert got == GOLDENS


def test_hash1_compat_mpla_range(spark):
    # the reference unit test inserts keys mpla0..mpla99 (myHash_test.c:46-66)
    keys = [f"mpla{i}" for i in range(100)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {r["key"]: r["h"] for r in df.select("key", hash1_compat(F.col("key")).alias("h")).collect()}
    assert got == {k: _hash1_c(k) for k in keys}
