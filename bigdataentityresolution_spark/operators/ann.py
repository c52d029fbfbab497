"""Approximate-nearest-neighbor search over embedding columns.

Pipeline extensions (no reference analog — the reference has no vector
search). Two strategies:

- brute_force_topk: exact cosine top-k. The query set is broadcast
  (small side), the corpus streams through one pass; per-corpus-row
  work is a JVM zip_with dot product; top-k via window. The baseline.
- lsh_topk: random-hyperplane LSH buckets restrict the join to
  candidates sharing a band; same top-k afterwards. The scale path:
  corpus-side work drops from O(|Q|·|C|) to O(collisions).
- ivf_topk: coarse inverted-file variant — corpus rows are assigned to
  their nearest of k seeded centroids (deterministic pseudo-random
  centroids); queries probe the nearest n_probe centroids only.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, cosine, rank) exact top-k by cosine.

    queries must be small enough to broadcast (the typical case:
    thousands of probes against a 10^9-vector corpus)."""
    # double precision throughout: float*float products diverge from the
    # DuckDB oracle (and from numpy) in the last ulp and flip rank ties
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("_cv")
    )
    cos = F.round(_dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv"))), 6)
    scored = c.crossJoin(F.broadcast(q)).select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def hyperplanes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    """Deterministic random hyperplanes — the SINGLE source of truth for
    the LSH constants, shared by the Spark operator and the DuckDB
    oracle builder (queries.py) so both engines block identically."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def ivf_centroids(n_centroids: int, dim: int, seed: int) -> np.ndarray:
    """Deterministic unit-norm centroids (same sharing rationale)."""
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_centroids, dim))
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def _hyperplane_bits(vec_col: str, n_planes: int, dim: int, seed: int) -> Column:
    planes = hyperplanes(n_planes, dim, seed)

    def bit(i: int) -> Column:
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col), F.array(*[F.lit(float(x)) for x in planes[i]]), lambda v, p: v * p
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (dot >= 0).cast("int")

    return F.array(*[bit(i) for i in range(n_planes)])


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 hyperplane-sign band.

    All similarity math in DOUBLE (float dots diverge from the oracle in
    the last ulp); pass ``dim`` to skip the driver-side probe."""
    rows_per_band = n_planes // bands
    if dim is None:
        dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    corpus = corpus.withColumn(vec_col, F.col(vec_col).cast("array<double>"))
    queries = queries.withColumn(vec_col, F.col(vec_col).cast("array<double>"))
    bits = _hyperplane_bits(vec_col, n_planes, dim, seed)
    keys = [
        F.concat_ws(
            ":",
            F.lit(str(b)),
            F.concat_ws(
                "_", *[F.element_at(bits, b * rows_per_band + r + 1) for r in range(rows_per_band)]
            ),
        )
        for b in range(bands)
    ]
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"),
        F.explode(F.array(*keys)).alias("bk"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        F.explode(F.array(*keys)).alias("bk"),
    )
    cos = F.round(_dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv"))), 6)
    scored = (
        c.join(F.broadcast(q), "bk")
        .select("query_id", "vec_id", "_qv", "_cv")
        .dropDuplicates(["query_id", "vec_id"])
        .select("query_id", "vec_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """IVF-style coarse quantization: deterministic random centroids;
    corpus rows assigned to nearest centroid (argmax dot); queries probe
    the n_probe nearest centroid cells only. DOUBLE math throughout;
    pass ``dim`` to skip the driver-side probe."""
    if dim is None:
        dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    corpus = corpus.withColumn(vec_col, F.col(vec_col).cast("array<double>"))
    queries = queries.withColumn(vec_col, F.col(vec_col).cast("array<double>"))
    cents = ivf_centroids(n_centroids, dim, seed)

    def cell_scores(col: str) -> Column:
        return F.array(
            *[
                F.struct(
                    F.round(
                        F.aggregate(
                            F.zip_with(
                                F.col(col),
                                F.array(*[F.lit(float(x)) for x in cents[i]]),
                                lambda v, p: v * p,
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ),
                        9,
                    ).alias("s"),
                    F.lit(i).alias("cell"),
                )
                for i in range(n_centroids)
            ]
        )

    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_cv"),
        F.array_max(cell_scores(vec_col))["cell"].alias("cell"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(
            F.slice(F.reverse(F.array_sort(cell_scores(vec_col))), 1, n_probe)
        ).alias("probe"),
    ).select("query_id", "_qv", F.col("probe")["cell"].alias("cell"))
    cos = F.round(_dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv"))), 6)
    scored = c.join(F.broadcast(q), "cell").select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
