"""MinHash / SimHash / LSH banding as pure Spark Column expressions.

Re-expression of the reference's hash-bucket blocking
(src/myHash.c:47-62 + src/functs.c:1731-1806): instead of one custom
char-hash modulo 500 cells, records are blocked by LSH bands over a
MinHash signature of token shingles — same role (bounded candidate
generation), scale-correct semantics (collision probability tracks
Jaccard similarity).

All hashing is built on functions.text.portable_hash so the DuckDB
oracle can reproduce values exactly. Everything is JVM-side expression
code — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from bigdataentityresolution_spark.functions.text import (
    HASH_PRIME,
    portable_hash,
    portable_hash_sql,
)

# Deterministic affine permutation parameters (a_i odd, b_i) derived
# from a fixed LCG so Spark, DuckDB SQL, and the NumPy test oracle can
# all regenerate them without sharing state.
_LCG_MULT = 6364136223846793005
_LCG_INC = 1442695040888963407
_MASK = (1 << 63) - 1


def perm_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """(a_i, b_i) for h_i(x) = (a_i * x + b_i) mod HASH_PRIME."""
    state = seed & _MASK
    out = []
    for _ in range(num_perm):
        state = (state * _LCG_MULT + _LCG_INC) & _MASK
        a = (state % (HASH_PRIME - 1)) | 1
        state = (state * _LCG_MULT + _LCG_INC) & _MASK
        b = state % HASH_PRIME
        out.append((a, b))
    return out


def minhash_signature(shingles_col: Column, num_perm: int = 32, seed: int = 42) -> Column:
    """ARRAY<BIGINT> of length num_perm: min_i over shingles of affine-permuted hash.

    Single pass over the shingle array per permutation — O(|shingles| * k)
    codegen'd arithmetic, no shuffle, no Python.
    """
    base = F.transform(shingles_col, lambda s: portable_hash(s))

    def permuted_min(a: int, b: int) -> Column:
        return F.array_min(
            F.transform(base, lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(HASH_PRIME))
        )

    return F.array(*[permuted_min(a, b) for a, b in perm_params(num_perm, seed)])


def minhash_signature_sql(shingles_expr: str, num_perm: int = 32, seed: int = 42) -> str:
    """DuckDB twin of :func:`minhash_signature`."""
    base = (
        f"list_transform({shingles_expr}, s -> {portable_hash_sql('s')})"
    )
    parts = [
        f"list_min(list_transform({base}, h -> (h * {a} + {b}) % {HASH_PRIME}))"
        for a, b in perm_params(num_perm, seed)
    ]
    return "[" + ", ".join(parts) + "]"


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """ARRAY<STRING> of band keys 'band:h' — the blocking keys.

    Two records share a block iff one full band of their signatures is
    identical. bands*rows_per_band must equal the signature length.
    """
    keys = [
        F.concat_ws(
            ":",
            F.lit(str(band)),
            F.concat_ws("_", *[F.element_at(signature, band * rows_per_band + r + 1) for r in range(rows_per_band)]),
        )
        for band in range(bands)
    ]
    return F.array(*keys)


def lsh_band_keys_sql(signature_expr: str, bands: int, rows_per_band: int) -> str:
    """DuckDB twin of :func:`lsh_band_keys`."""
    keys = []
    for band in range(bands):
        elems = " || '_' || ".join(
            f"CAST(list_extract({signature_expr}, {band * rows_per_band + r + 1}) AS VARCHAR)"
            for r in range(rows_per_band)
        )
        keys.append(f"('{band}' || ':' || ({elems}))")
    return "[" + ", ".join(keys) + "]"


def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash of a token array as BIGINT.

    Two portable 32-ish-bit hashes per token (seeds 1, 2) are concatenated
    into a 60-bit fingerprint space: bit b of the result is 1 iff the
    majority of tokens have bit b set in their combined hash. Near-dup
    docs differ in few bits (hamming distance).
    """
    h1 = F.transform(tokens_col, lambda t: portable_hash(t, seed=1))
    h2 = F.transform(tokens_col, lambda t: portable_hash(t, seed=2))

    def bit_vote(src: Column, shift: int) -> Column:
        return F.aggregate(
            src,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(F.shiftright(h, shift) % 2 == 1, 1).otherwise(-1),
        )

    bits = []
    for b in range(60):
        src, shift = (h1, b) if b < 30 else (h2, b - 30)
        vote = bit_vote(src, shift)
        bits.append(F.when(vote > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for c in bits[1:]:
        out = out + c
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two BIGINT bit-fingerprints (codegen'd popcount)."""
    return F.bit_count(a.bitwiseXOR(b))
