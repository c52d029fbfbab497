"""Pairwise scoring: similarity features + mini-batch logistic regression.

Re-expression of the reference's classifier stage (src/logistic.c):

- The reference concatenates two 1000-dim TF-IDF vectors per pair
  (src/functs.c:1005-1031) and trains LR over 2·|V| weights with
  Hogwild-style concurrent batch updates under a mutex
  (src/logistic.c:346-472, batches of 500 pairs, 2 GD iterations each,
  lr=0.6, stop=0.15, moving threshold clamped to [0.2, 0.8]).
- The new engine computes THREE pairwise similarity features
  (cosine over TF-IDF maps, Jaccard over token sets, bounded
  Levenshtein — all JVM expressions, functions/similarity.py) and
  trains the same LR loop SYNCHRONOUSLY: per round, per-batch gradients
  computed in an Arrow-vectorized applyInPandas kernel, averaged on the
  driver, weights broadcast back. Deterministic replacement for the
  reference's racy Hogwild (SURVEY.md §2.10).

Deliberate deviations (SURVEY.md §7.2, documented not cargo-culted):
- bias gradient = mean(missed), not the reference's mean(|missed|)
  (src/logistic.c:384-392 accumulates absolute values — a bug that
  makes the bias monotonically decrease).
- No int-truncating sparse dot (src/logistic.c:899).
- Threshold update reproduces logistic_overfit_dataList EXACTLY
  (src/logistic.c:693-734) including clamp-then-return ordering and
  cumulative fit1/fit0 counters.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdataentityresolution_spark.functions.similarity import (
    cosine_maps,
    jaccard_arrays,
    levenshtein_bounded,
)

FEATURE_COLS = ("f_cosine", "f_jaccard", "f_lev")


@dataclass(frozen=True)
class LRModel:
    """Driver-held model state; broadcast per training round."""

    weights: tuple[float, ...] = (0.0, 0.0, 0.0)
    bias: float = 0.0
    threshold: float = 0.5
    lr: float = 0.6  # LEARING_RATE include/logistic.h:168
    stop_limit: float = 0.15  # STOP_LIMIT include/logistic.h:169
    fit1: int = 0
    fit0: int = 0
    rounds_trained: int = 0

    def w(self) -> np.ndarray:
        return np.asarray(self.weights, dtype=np.float64)


def pair_features(
    candidates: DataFrame,
    docs: DataFrame,
    id_col: str = "spec_id",
    vector_col: str = "features",
    tokens_col: str = "tokens",
    text_col: str = "content",
    lev_bound: int = 128,
) -> DataFrame:
    """Join candidate (a, b) pairs to both sides' doc representations and
    compute the similarity feature columns.

    docs must carry: id, TF-IDF map (vector_col), token array
    (tokens_col), and raw text (text_col). Only the Levenshtein prefix
    (lev_bound chars) of the text is shipped through the join — at
    10^12 rows the full content must never ride a pair shuffle.
    """
    side = docs.select(
        F.col(id_col).alias("_id"),
        F.col(vector_col).alias("_vec"),
        F.col(tokens_col).alias("_toks"),
        F.substring(F.col(text_col), 1, lev_bound).alias("_prefix"),
    )
    a = side.select(
        F.col("_id").alias("a"),
        F.col("_vec").alias("_vec_a"),
        F.col("_toks").alias("_toks_a"),
        F.col("_prefix").alias("_prefix_a"),
    )
    b = side.select(
        F.col("_id").alias("b"),
        F.col("_vec").alias("_vec_b"),
        F.col("_toks").alias("_toks_b"),
        F.col("_prefix").alias("_prefix_b"),
    )
    out = (
        candidates.join(a, "a")
        .join(b, "b")
        .withColumn(
            "f_jaccard", F.round(jaccard_arrays(F.col("_toks_a"), F.col("_toks_b")), 9)
        )
        .withColumn("f_cosine", F.round(cosine_maps(F.col("_vec_a"), F.col("_vec_b")), 9))
        # Levenshtein is the one O(len²) feature (lev_bound² DP cells per
        # pair). Most LSH candidates are junk (low Jaccard); gate the DP
        # behind the cheap token-Jaccard test — a pair with J < 0.1 gets
        # f_lev = 0.0, which the classifier reads the same way the true
        # distance would (clear non-match). Deterministic and documented.
        .withColumn(
            "f_lev",
            F.when(
                F.col("f_jaccard") >= 0.1,
                levenshtein_bounded(F.col("_prefix_a"), F.col("_prefix_b"), lev_bound),
            ).otherwise(F.lit(0.0)),
        )
    )
    return out.drop("_vec_a", "_vec_b", "_toks_a", "_toks_b", "_prefix_a", "_prefix_b")


def est_jaccard_expr(sig_a: Column, sig_b: Column, num_perm: int) -> Column:
    """MinHash-estimated Jaccard: fraction of agreeing signature slots."""
    agree = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return agree.cast("double") / F.lit(float(num_perm))


def pair_features_compact(
    candidates: DataFrame,
    docs_compact: DataFrame,
    num_perm: int = 32,
    lev_bound: int = 128,
    sig_prefilter: float | None = 0.2,
) -> DataFrame:
    """The SCALE path for pair features: candidates join only COMPACT
    per-doc state — (spec_id, sig ARRAY<BIGINT>, features MAP, prefix).

    Why this exists (measured, see BENCH/BASELINE.md history): joining the
    full token arrays through a multi-million-pair shuffle replicates
    each doc's ~KB payload ~fan-out times and spills; the sketch is 256 B.
    Feature set:
      f_jaccard — MinHash-ESTIMATED Jaccard (signature agreement)
      f_cosine  — cosine over top-k-pruned TF-IDF maps
      f_lev     — bounded prefix Levenshtein, gated on f_jaccard
    sig_prefilter drops pairs whose estimated Jaccard is below the bar
    BEFORE the expensive features — label-driven edges never pass through
    here, so blocking recall is unaffected and closure heals stragglers.
    """
    # shuffle_hash hint: NEVER let the planner broadcast the doc-state
    # side. Its size estimate is unreliable before the cache materializes
    # (map columns), and a mis-planned broadcast of a corpus-scale table
    # is fatal (measured: a "small-looking" 384k-row side materialized a
    # 10.8 GiB broadcast and killed the job). Shuffled-hash join is the
    # plan that survives 10^12 rows: pairs shuffle on the id, docs build
    # per-partition hash tables, no sort of the pair side.
    side = docs_compact.hint("shuffle_hash").select(
        F.col("spec_id").alias("_id"),
        F.col("sig").alias("_sig"),
        F.col("features").alias("_vec"),
        F.col("prefix").alias("_prefix"),
    )
    a = side.select(
        F.col("_id").alias("a"), F.col("_sig").alias("_sig_a"),
        F.col("_vec").alias("_vec_a"), F.col("_prefix").alias("_prefix_a"),
    )
    b = side.select(
        F.col("_id").alias("b"), F.col("_sig").alias("_sig_b"),
        F.col("_vec").alias("_vec_b"), F.col("_prefix").alias("_prefix_b"),
    )
    out = (
        candidates.join(a, "a")
        .join(b, "b")
        .withColumn(
            "f_jaccard",
            F.round(est_jaccard_expr(F.col("_sig_a"), F.col("_sig_b"), num_perm), 9),
        )
    )
    if sig_prefilter is not None:
        out = out.filter(F.col("f_jaccard") >= sig_prefilter)
    out = (
        out.withColumn("f_cosine", F.round(cosine_maps(F.col("_vec_a"), F.col("_vec_b")), 9))
        .withColumn(
            "f_lev",
            F.when(
                F.col("f_jaccard") >= 0.1,
                levenshtein_bounded(F.col("_prefix_a"), F.col("_prefix_b"), lev_bound),
            ).otherwise(F.lit(0.0)),
        )
        # vocab coverage diagnostic (NOT a model feature): min map size of
        # the pair. A doc whose tokens all fall outside the top-k vocab
        # has an empty TF-IDF map and f_cosine identically 0 — edge
        # policies must not let a cosine floor hard-veto such pairs
        # (ADVICE.md r1: recall can silently collapse on vocab-diverse
        # corpora).
        .withColumn(
            "f_vocab_cov",
            F.least(F.size(F.map_keys("_vec_a")), F.size(F.map_keys("_vec_b"))),
        )
    )
    return out.drop("_sig_a", "_sig_b", "_vec_a", "_vec_b", "_prefix_a", "_prefix_b")


def pair_features_from_est(
    candidates_with_est: DataFrame,
    docs_compact: DataFrame,
    lev_bound: int = 128,
    sig_prefilter: float | None = 0.2,
) -> DataFrame:
    """Featurize (a, b, est_j) candidates produced by
    blocking.candidate_pairs_with_est: the est-Jaccard prefilter runs
    BEFORE any join (the est was computed in-block), so only survivors
    (~5 % at the default floor) probe the compact doc state for the
    TF-IDF map + prefix — at bench scale this removed the pipeline's
    hottest shuffle (2·|pairs| sketch probes). Signature columns never
    ride this join at all. Callers mixing candidate CHANNELS (the ER
    pipeline's lexical ∪ semantic union) pass sig_prefilter=None and
    apply the filter per-channel before the union — semantic-channel
    pairs are selected precisely because they live below the sketch
    estimate's reach, so the prefilter must never see them.

    Output schema matches pair_features_compact: (a, b, f_jaccard,
    f_cosine, f_lev, f_vocab_cov).
    """
    out = candidates_with_est
    if sig_prefilter is not None:
        out = out.filter(F.col("est_j") >= sig_prefilter)
    side = docs_compact.hint("shuffle_hash").select(
        F.col("spec_id").alias("_id"),
        F.col("features").alias("_vec"),
        F.col("prefix").alias("_prefix"),
    )
    a = side.select(
        F.col("_id").alias("a"), F.col("_vec").alias("_vec_a"),
        F.col("_prefix").alias("_prefix_a"),
    )
    b = side.select(
        F.col("_id").alias("b"), F.col("_vec").alias("_vec_b"),
        F.col("_prefix").alias("_prefix_b"),
    )
    out = (
        out.join(a, "a")
        .join(b, "b")
        .withColumn("f_jaccard", F.col("est_j"))
        .withColumn("f_cosine", F.round(cosine_maps(F.col("_vec_a"), F.col("_vec_b")), 9))
        .withColumn(
            "f_lev",
            F.when(
                F.col("f_jaccard") >= 0.1,
                levenshtein_bounded(F.col("_prefix_a"), F.col("_prefix_b"), lev_bound),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "f_vocab_cov",
            F.least(F.size(F.map_keys("_vec_a")), F.size(F.map_keys("_vec_b"))),
        )
    )
    return out.drop("est_j", "_vec_a", "_vec_b", "_prefix_a", "_prefix_b")


def pair_feature_concat_sparse(
    pairs: DataFrame,
    doc_vectors: DataFrame,
    vocab_k: int,
    id_col: str = "spec_id",
    vec_col: str = "features",
) -> DataFrame:
    """Reference-exact SPARSE pair representation: the pair's feature is
    the concatenation of the two docs' sparse TF-IDF vectors, with the
    second doc's term indices offset by the vocabulary size
    (spars_concat_col, reference src/functs.c:1185-1203: col[1] of the
    second spec's COO triples gets `+ bow->entries`; the first spec —
    the pair's left side — keeps its indices, no reordering).

    pairs: (a, b[, ...]); doc_vectors: (spec_id, features MAP<INT,FLOAT>).
    Output: pairs' columns + `pair_features` MAP<INT,FLOAT> over the
    doubled index space [0, 2*vocab_k). Docs missing from doc_vectors
    contribute an empty side (the engine's prep emits empty maps for
    vocab-disjoint docs — same convention).

    The engine's production scorer deliberately does NOT use this
    representation (3 similarity features instead, SURVEY.md §7.0); it
    exists for parity with the reference's LR feature space and for
    pipelines that want the raw bag-of-words pair vector.
    """
    empty = F.map_from_arrays(
        F.array().cast("array<int>"), F.array().cast("array<float>")
    )
    side = doc_vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    out = (
        pairs.join(side.withColumnRenamed("_id", "a"), "a", "left")
        .withColumnRenamed("_v", "_v_a")
        .join(side.withColumnRenamed("_id", "b"), "b", "left")
        .withColumnRenamed("_v", "_v_b")
        .withColumn("_v_a", F.coalesce("_v_a", empty))
        .withColumn(
            "_v_b",
            F.transform_keys(
                F.coalesce("_v_b", empty), lambda k, _: k + F.lit(int(vocab_k))
            ),
        )
        .withColumn("pair_features", F.map_concat("_v_a", "_v_b"))
    )
    return out.drop("_v_a", "_v_b")


def pair_feature_concat_dense(
    pairs: DataFrame,
    doc_vectors: DataFrame,
    vocab_k: int,
    id_col: str = "spec_id",
    vec_col: str = "features",
) -> DataFrame:
    """Reference-exact DENSE pair representation: a 2*vocab_k float array
    where the doc with the LARGER vector element-sum occupies [0, k) and
    the other [k, 2k) — ties keep the pair's left side first
    (concat_specVectors, reference src/functs.c:1005-1031: the vectors
    swap places iff sum1 < sum2 strictly).

    Same caveats as :func:`pair_feature_concat_sparse`; the dense form
    additionally materializes 2*vocab_k floats per pair, so at candidate
    scale it belongs behind an aggressive prefilter. All arithmetic is
    JVM-side (transform/aggregate expressions), no Python in the path.
    """
    empty = F.map_from_arrays(
        F.array().cast("array<int>"), F.array().cast("array<float>")
    )

    def dense(m: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(int(vocab_k) - 1)),
            lambda i: F.coalesce(
                F.element_at(m, i), F.lit(0.0).cast("float")
            ),
        )

    def vec_sum(m: Column) -> Column:
        return F.aggregate(
            F.map_values(m),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double"),
        )

    side = doc_vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    out = (
        pairs.join(side.withColumnRenamed("_id", "a"), "a", "left")
        .withColumnRenamed("_v", "_v_a")
        .join(side.withColumnRenamed("_id", "b"), "b", "left")
        .withColumnRenamed("_v", "_v_b")
        .withColumn("_v_a", F.coalesce("_v_a", empty))
        .withColumn("_v_b", F.coalesce("_v_b", empty))
        .withColumn(
            "pair_features",
            F.when(
                vec_sum(F.col("_v_a")) >= vec_sum(F.col("_v_b")),
                F.concat(dense(F.col("_v_a")), dense(F.col("_v_b"))),
            ).otherwise(F.concat(dense(F.col("_v_b")), dense(F.col("_v_a")))),
        )
    )
    return out.drop("_v_a", "_v_b")


def prune_weak_examples(
    scored: DataFrame, threshold: float, proba_col: str = "proba"
) -> DataFrame:
    """Weak-example pruning (dataI_remove_weak, src/logistic.c:1040-1065):
    keep a pseudo-labeled example only when its probability is in the
    CONFIDENT third of its side of the threshold —
    proba >= 1 - (1-t)/3 (strong positive) or proba <= t/3 (strong
    negative); the middle band is dropped. Boundary semantics match the
    reference exactly: `proba < limit1` and `proba > limit0` are the
    REMOVED bands, so both limits themselves survive.

    The reference build constructs but never invokes this pruning (its
    self-training path uses the fixed [0.85/0.15] confidence band —
    filter_confidence_band here); implemented for full §2 parity and for
    callers that want threshold-relative pseudo-label hygiene.
    """
    t = float(threshold)
    limit1 = 1.0 - (1.0 - t) / 3.0
    limit0 = t / 3.0
    p = F.col(proba_col)
    return scored.filter((p >= F.lit(limit1)) | (p <= F.lit(limit0)))


def proba_expr(model: LRModel, feature_cols: tuple[str, ...] = FEATURE_COLS) -> Column:
    """sigmoid(b + w·x) as a JVM expression (calc_s, src/logistic.c:915-950)."""
    z = F.lit(float(model.bias))
    for wj, c in zip(model.weights, feature_cols):
        z = z + F.lit(float(wj)) * F.col(c)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def predict(
    scored: DataFrame, model: LRModel, feature_cols: tuple[str, ...] = FEATURE_COLS
) -> DataFrame:
    """Adds proba + predict columns (logistic_predict_proba_dataList,
    src/logistic.c:522-552: predict = proba >= threshold)."""
    return scored.withColumn("proba", proba_expr(model, feature_cols)).withColumn(
        "predict", (F.col("proba") >= F.lit(float(model.threshold))).cast("int")
    )


def update_threshold(model: LRModel, n_pos: int, n_neg: int) -> LRModel:
    """Exact logistic_overfit_dataList (src/logistic.c:693-734):
    cumulative fit1/fit0; clamp-then-return at [0.2, 0.8]; rate from the
    majority side; threshold += (threshold/rate) * threshold."""
    fit1 = model.fit1 + n_pos
    fit0 = model.fit0 + n_neg
    t = model.threshold
    if t >= 0.8:
        return replace(model, fit1=fit1, fit0=fit0, threshold=0.8)
    if t <= 0.2:
        return replace(model, fit1=fit1, fit0=fit0, threshold=0.2)
    if fit1 > fit0:
        rate = float(fit1) if fit0 == 0 else fit1 / fit0
    else:
        rate = -float(fit0) if fit1 == 0 else -fit0 / fit1
    t = t + (t / rate) * t
    return replace(model, fit1=fit1, fit0=fit0, threshold=t)


def _batch_gradient_kernel(feature_cols: tuple[str, ...], weights: np.ndarray, bias: float):
    """applyInPandas kernel: one (n_pairs, b_grad, grad_0..grad_d) row per
    batch. Arrow-columnar in, numpy vectorized — no per-row Python."""

    d = len(feature_cols)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[list(feature_cols)].to_numpy(dtype=np.float64)
        y = pdf["label"].to_numpy(dtype=np.float64)
        z = bias + x @ weights
        proba = 1.0 / (1.0 + np.exp(-z))
        missed = proba - y
        n = len(pdf)
        grad = (x * missed[:, None]).sum(axis=0) / n
        out = {
            "n_pairs": [n],
            "b_grad": [missed.mean()],
            "abs_missed_sum": [np.abs(missed).sum()],
        }
        for j in range(d):
            out[f"g{j}"] = [grad[j]]
        return pd.DataFrame(out)

    schema = "n_pairs long, b_grad double, abs_missed_sum double, " + ", ".join(
        f"g{j} double" for j in range(d)
    )
    return kernel, schema


def fit_lr(
    pairs: DataFrame,
    feature_cols: tuple[str, ...] = FEATURE_COLS,
    label_col: str = "label",
    model: LRModel | None = None,
    max_rounds: int = 2,
    batch_size: int = 500,
) -> LRModel:
    """Synchronous mini-batch GD.

    Per round: batch id = row hash mod n_batches (deterministic stand-in
    for the reference's arrival-order batching, 500 pairs/batch
    src/functs.c:20); applyInPandas computes per-batch gradients
    (ONE shuffle on batch id); driver averages (weighted by batch size),
    updates weights (w -= lr·grad, weights_update src/logistic.c:773-801)
    and the moving threshold; stops when mean |missed| <= stop_limit or
    after max_rounds (reference: trained_times > 1 → stop,
    src/logistic.c:454 — default max_rounds=2 mirrors it; pipelines may
    raise it).
    """
    model = model or LRModel(weights=tuple(0.0 for _ in feature_cols))
    df = pairs.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("label"),
    ).cache()
    n_total = df.count()
    if n_total == 0:
        return model
    n_batches = max(1, (n_total + batch_size - 1) // batch_size)
    batched = df.withColumn(
        "_batch",
        F.pmod(F.xxhash64(*feature_cols, "label"), F.lit(n_batches)),
    )

    label_counts = {
        int(r["label"]): r["n"]
        for r in df.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    for _ in range(max_rounds):
        kernel, schema = _batch_gradient_kernel(feature_cols, model.w(), model.bias)
        stats = batched.groupBy("_batch").applyInPandas(kernel, schema).collect()
        n = sum(r["n_pairs"] for r in stats)
        b_grad = sum(r["b_grad"] * r["n_pairs"] for r in stats) / n
        grad = np.array(
            [sum(r[f"g{j}"] * r["n_pairs"] for r in stats) / n for j in range(len(feature_cols))]
        )
        mean_abs_missed = sum(r["abs_missed_sum"] for r in stats) / n

        new_w = model.w() - model.lr * grad
        model = replace(
            model,
            weights=tuple(float(v) for v in new_w),
            bias=float(model.bias - model.lr * b_grad),
            rounds_trained=model.rounds_trained + 1,
        )
        model = update_threshold(model, label_counts.get(1, 0), label_counts.get(0, 0))
        if mean_abs_missed <= model.stop_limit:
            break

    df.unpersist()
    return model


def _ridge_penalty(d: int, ridge: float, n_total: int) -> np.ndarray:
    """(d+1)² ridge penalty, intercept UNPENALIZED (conventional ridge;
    the r1 version shrank the bias toward 0 and distorted the predicted
    base rate — ADVICE.md). The n-scaling keeps the penalty's relative
    strength constant as the pair count grows."""
    p = np.eye(d + 1) * (ridge * max(1.0, float(n_total)))
    p[0, 0] = 0.0
    return p


def fit_lr_newton(
    pairs: DataFrame,
    feature_cols: tuple[str, ...] = FEATURE_COLS,
    label_col: str = "label",
    max_rounds: int = 8,
    ridge: float = 1e-3,
    tol: float = 1e-4,
    model: LRModel | None = None,
    driver_fit_max: int | None = 2_000_000,
) -> LRModel:
    """IRLS (Newton) fit — the pipeline's production trainer.

    Two execution paths, same math:
    - n ≤ driver_fit_max (the common case: labeled pairs are tiny next
      to the corpus): ONE Arrow toPandas collect, all Newton rounds in
      local numpy. Removes max_rounds driver-barrier jobs — profiling
      showed the per-round applyInPandas+collect cycle was the single
      largest NON-scaling stage of the ER pipeline (13-30 s wall at
      bench scale regardless of core count, pure scheduling latency).
      The collected payload is (d+1) float64s per row — 2M pairs ≈ 64 MB.
    - larger: distributed rounds — an applyInPandas kernel emits
      per-batch partial gradient + Hessian sums (feature count is tiny,
      so the Hessian is a (d+1)² matrix — driver-solvable), ONE shuffle
      per round. Converges in ~5 rounds where the reference's lr=0.6 GD
      (kept in fit_lr for parity) needs hundreds.

    Threshold bookkeeping matches fit_lr. Regularization (be precise —
    r4 audit): the ridge·n·I penalty (intercept diagonal zeroed, see
    _ridge_penalty) sits in the HESSIAN ONLY, i.e. Levenberg-style step
    damping, NOT an L2-penalized objective — iterated to convergence it
    would reach the unpenalized MLE. The effective regularizer is
    damping + the bounded round budget (max_rounds ≤ 8), which is what
    keeps near-separable fits from blowing the weights up in a
    noise-chosen direction (measured: w_jaccard ≈ +30, w_cosine ≈ −9.5
    at ridge 1e-8 — the sign on cosine was WRONG and MinHash noise-tail
    pairs crossed the threshold). A true-ridge variant (penalty in the
    gradient too) was tried in r4 and REJECTED on measurement: it
    flattens the fit enough that the calibrated edge threshold drops
    (0.45 → 0.18 on the tiny hard corpus) and full-floor template
    negatives walk over it (pairwise precision 0.95 → 0.17), while the
    hard-tier conditional structure the model needs (same cosine,
    LOWER lev ⇒ clone, not boilerplate — a legitimately negative
    conditional weight) is weakened. The damped/early-stopped fit is
    the behavior every committed quality number rests on.
    """
    model = model or LRModel(weights=tuple(0.0 for _ in feature_cols))
    d = len(feature_cols)
    df = pairs.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("label"),
    ).cache()
    n_total = df.count()
    if n_total == 0:
        return model

    if driver_fit_max is not None and n_total <= driver_fit_max:
        pdf = df.toPandas()
        df.unpersist()
        x = np.column_stack(
            [np.ones(len(pdf)), pdf[list(feature_cols)].to_numpy(dtype=np.float64)]
        )
        y = pdf["label"].to_numpy(dtype=np.float64)
        n_pos = int((y == 1.0).sum())
        n_neg = int((y == 0.0).sum())
        beta = np.concatenate([[model.bias], model.w()])
        penalty = _ridge_penalty(d, ridge, n_total)
        for _ in range(max_rounds):
            p = 1.0 / (1.0 + np.exp(-(x @ beta)))
            g = x.T @ (p - y)
            h = x.T @ (x * (p * (1.0 - p))[:, None]) + penalty
            step = np.linalg.solve(h, g)
            beta = beta - step
            model = replace(
                model,
                weights=tuple(float(v) for v in beta[1:]),
                bias=float(beta[0]),
                rounds_trained=model.rounds_trained + 1,
            )
            model = update_threshold(model, n_pos, n_neg)
            if float(np.abs(step).max()) < tol:
                break
        return model

    label_counts = {
        int(r["label"]): r["n"]
        for r in df.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_batch_keys = max(1, min(64, n_total // 1000 + 1))
    batched = df.withColumn(
        "_batch", F.pmod(F.xxhash64(*feature_cols, "label"), F.lit(n_batch_keys))
    )

    def make_kernel(weights: np.ndarray, bias: float):
        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            x = np.column_stack(
                [np.ones(len(pdf)), pdf[list(feature_cols)].to_numpy(dtype=np.float64)]
            )
            y = pdf["label"].to_numpy(dtype=np.float64)
            beta = np.concatenate([[bias], weights])
            p = 1.0 / (1.0 + np.exp(-(x @ beta)))
            g = x.T @ (p - y)  # (d+1,) partial gradient sum
            wdiag = p * (1 - p)
            h = x.T @ (x * wdiag[:, None])  # (d+1, d+1) partial Hessian sum
            out = {"n": [len(pdf)]}
            for i in range(d + 1):
                out[f"g{i}"] = [g[i]]
            for i in range(d + 1):
                for j in range(d + 1):
                    out[f"h{i}_{j}"] = [h[i, j]]
            return pd.DataFrame(out)

        schema = (
            "n long, "
            + ", ".join(f"g{i} double" for i in range(d + 1))
            + ", "
            + ", ".join(f"h{i}_{j} double" for i in range(d + 1) for j in range(d + 1))
        )
        return kernel, schema

    beta = np.concatenate([[model.bias], model.w()])
    for _ in range(max_rounds):
        kernel, schema = make_kernel(beta[1:], beta[0])
        stats = batched.groupBy("_batch").applyInPandas(kernel, schema).collect()
        g = np.array([sum(r[f"g{i}"] for r in stats) for i in range(d + 1)])
        h = np.array(
            [[sum(r[f"h{i}_{j}"] for r in stats) for j in range(d + 1)] for i in range(d + 1)]
        )
        h += _ridge_penalty(d, ridge, n_total)
        step = np.linalg.solve(h, g)
        beta = beta - step
        model = replace(
            model,
            weights=tuple(float(v) for v in beta[1:]),
            bias=float(beta[0]),
            rounds_trained=model.rounds_trained + 1,
        )
        model = update_threshold(model, label_counts.get(1, 0), label_counts.get(0, 0))
        if float(np.abs(step).max()) < tol:
            break
    df.unpersist()
    return model


def calibrate_edge_threshold(
    labeled_pairs: DataFrame,
    model: LRModel,
    feature_cols: tuple[str, ...] = FEATURE_COLS,
    label_col: str = "label",
    driver_max: int = 2_000_000,
) -> float:
    """F1-maximizing decision threshold on the labeled pairs.

    Why this exists: the reference's moving threshold
    (logistic_overfit_dataList, src/logistic.c:693-734 — kept verbatim in
    update_threshold for §2.9 parity) monotonically climbs to its 0.8
    clamp whenever cumulative fit1 > fit0. That is harmless for the
    reference's 2000-dim LR, whose probabilities saturate at 0/1 — but a
    compact similarity-feature model on a genuinely hard corpus is not
    that confident (measured on the HARD tier: max candidate proba 0.795
    < the 0.8 clamp → ZERO predicted edges, recall collapsed to the
    labeled closure). Calibrating on labeled data is the standard fix:
    sweep every distinct proba midpoint, pick the F1-argmax, tie-break
    toward the HIGHER threshold (precision-first, same reasoning as the
    edge floors).

    Driver-local by design: labeled pairs are the small relation of the
    problem (same size gate as the IRLS driver path). Falls back to
    model.threshold when the labels are single-class.
    """
    pdf = (
        predict(labeled_pairs, model, feature_cols)
        .select(F.col("proba"), F.col(label_col).cast("double").alias("label"))
        .limit(driver_max)
        .toPandas()
    )
    y = pdf["label"].to_numpy(dtype=np.float64)
    p = pdf["proba"].to_numpy(dtype=np.float64)
    n_pos = float((y == 1.0).sum())
    if n_pos == 0 or n_pos == len(y):
        return model.threshold
    order = np.argsort(-p)
    p_sorted, y_sorted = p[order], y[order]
    tp = np.cumsum(y_sorted)
    k = np.arange(1, len(y) + 1)
    f1 = 2 * tp / (k + n_pos)  # 2tp / (tp+fp + tp+fn)
    # candidate thresholds: midpoints ABOVE each cut position (accept the
    # top-k probas); collapse ties so a threshold never splits equal probas
    valid = np.r_[p_sorted[:-1] != p_sorted[1:], True]
    best = int(np.flatnonzero(valid)[np.argmax(f1[valid])])
    hi = p_sorted[best]
    lo = p_sorted[best + 1] if best + 1 < len(p_sorted) else max(hi - 1e-6, 0.0)
    return float(min((hi + lo) / 2.0, hi - 1e-12))


def calibrate_override_bar(
    labeled_pairs: DataFrame,
    model: LRModel,
    jaccard_min: float,
    cosine_min: float,
    feature_cols: tuple[str, ...] = FEATURE_COLS,
    label_col: str = "label",
    floor: float = 0.8,
    cap: float = 0.99,
    margin: float = 0.02,
    min_n: int = 150,
    driver_max: int = 2_000_000,
    cosine_exempt_empty: bool = True,
) -> float:
    """Calibrate the high-confidence override bar on the labeled pairs.

    The override accepts an edge under RELAXED similarity floors when the
    model is sufficiently confident; the question is what "sufficiently"
    means. A fixed bar is either too strict (r4 measured: true
    adversarial clones score proba 0.95-0.98 and a 0.98 bar rejects all
    of them — recall 0.69) or unsafe on a corpus whose negatives the
    model scores high. Calibration answers it directly: the bar is the
    max proba any LABELED NEGATIVE that passes the relaxed floors
    achieves, plus a margin — i.e. the smallest bar the evidence says no
    known-negative clears — clamped to [floor, cap].

    **Lowering the bar below ``cap`` requires POSITIVE evidence.** If
    fewer than ``min_n`` labeled negatives pass the relaxed floors, the
    sample says nothing about the high-proba tail of the corpus's
    relaxed-region negatives, and the bar stays at ``cap``. Absence of
    evidence is not favorable evidence — measured r4: on the standard
    bench corpus ZERO labeled negatives pass the relaxed floors, and an
    earlier draft that fell back to ``floor`` admitted 117 cross-cluster
    false edges scoring 0.80-0.898 (pairwise precision 1.0 -> 0.970),
    none of which any labeled pair foreshadowed. On the hard tier 381
    labeled negatives pass (max proba 0.177) — there the evidence is
    real, the floor bar is granted, and it admits 11.7k true low-overlap
    clone edges with zero false ones.

    ``min_n=150`` is the rule of three: n all-clean negative samples in
    the region bound the region's true high-proba negative rate below
    ~3/n at 95% confidence, so n=150 certifies ≲2%; the r4 value of 30
    certified only ≲10%, and the tiny hard corpus (46 in-region
    negatives, a fragile small-sample IRLS fit whose noise pocket the
    labels never sampled) walked through it: 120 false cluster pairs at
    proba 0.80-0.86, pairwise precision 0.95 → 0.80. A sample-size gate
    is the honest fix — weight-sign gating was tried and rejected,
    because at bench scale a negative CONDITIONAL weight (same cosine,
    lower lev ⇒ clone not boilerplate) is genuine generalizing signal,
    not pathology.

    ``floor`` defaults to 0.8, the reference's own confidence clamp
    (logistic_overfit_dataList's threshold ceiling, src/logistic.c:734):
    no matter how clean the labeled negatives look, an override below
    that structural minimum is never granted, because a finite labeled
    negative sample can still under-represent the corpus's negative
    shapes.

    Driver-local like calibrate_edge_threshold: labeled pairs are the
    problem's small relation.

    ``cosine_exempt_empty``: the default region matches the edge
    policy's vocab-empty exemption (a pair with an empty TF-IDF
    projection has cosine identically 0 and must not be hard-vetoed).
    The SEMANTIC override path calibrates with ``False`` — its region
    IS "cosine at least cmin", so zero-cosine pairs are outside it by
    definition and their (numerous, low-proba) labeled negatives must
    not dilute the in-region evidence.
    """
    cos_ok = F.col("f_cosine") >= F.lit(float(cosine_min))
    if cosine_exempt_empty:
        cos_ok = cos_ok | (F.col("f_cosine") == 0)
    relaxed = (F.col("f_jaccard") >= F.lit(float(jaccard_min))) & cos_ok
    pdf = (
        predict(labeled_pairs, model, feature_cols)
        .filter((F.col(label_col) == 0) & relaxed)
        .select("proba")
        .limit(driver_max)
        .toPandas()
    )
    if len(pdf) < int(min_n):
        return float(cap)
    worst = float(pdf["proba"].max())
    # Headroom rule (r4): the bar must stand clear of the worst labeled
    # negative by at least half its remaining distance to certainty, not
    # a flat 0.02. A labeled-negative max is an n-sample extreme — the
    # corpus's unlabeled negative tail WILL exceed it — so a worst near
    # the floor (say 0.78) must not be granted a bar of 0.80 with only
    # 0.02 of room; it gets 0.89. When the model separates sharply
    # (bench-scale hard tier: worst 0.177), the rule is inactive — the
    # floor clamp binds and the grant is unchanged. Note this rule is a
    # BACKSTOP for moderate worsts; the tiny-corpus failure mode (all
    # labeled negatives ≤ 0.6 yet an unlabeled pocket at 0.80-0.86,
    # because the thin-sample fit's geometry differs from the tail's) is
    # caught by the min_n evidence gate above, not by any margin on the
    # max.
    headroom = max(margin, 0.5 * (1.0 - worst))
    return float(min(max(worst + headroom, floor), cap))


def accuracy(scored: DataFrame, label_col: str = "label") -> float:
    """corrects / total (logistic_score, src/logistic.c:601-615) — the
    global definition, not the reference's per-batch mean-of-means quirk
    (src/functs.c:1504-1508)."""
    row = scored.select(
        F.avg((F.col("predict") == F.col(label_col)).cast("double")).alias("acc")
    ).collect()[0]
    return float(row["acc"]) if row["acc"] is not None else 0.0


def self_training_pseudo_labels(
    scored_candidates: DataFrame,
    known_pairs: DataFrame,
    limit: int | None = None,
) -> DataFrame:
    """One self-training round's pseudo-labeled pairs
    (src/functs.c:1671-1728): keep label 1 iff 0.85 <= p < 1.0, label 0
    iff 0.0 < p <= 0.15 (confidence band src/functs.c:1846-1852); drop
    pairs already labeled (check_info_list src/functs.c:1883-1928);
    cap at `limit` (pairs_limit = set_size × 12, src/functs.c:23,1718),
    deterministic order (by confidence, then pair) instead of the
    reference's racy global counter."""
    banded = scored_candidates.withColumn(
        "label",
        F.when((F.col("proba") >= 0.85) & (F.col("proba") < 1.0), F.lit(1))
        .when((F.col("proba") > 0.0) & (F.col("proba") <= 0.15), F.lit(0))
        .otherwise(F.lit(None)),
    ).filter(F.col("label").isNotNull())
    known = known_pairs.select(
        F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
    )
    fresh = banded.join(known, ["a", "b"], "left_anti")
    if limit is not None:
        # Apply the cap only when it binds: an exact global top-`limit`
        # funnels `limit` rows through ONE partition (Sort + GlobalLimit),
        # and pairs_limit = 12 x train size can be millions — paying that
        # concentration point when fresh already fits under the cap is a
        # pure scaling loss (the common case at scale: the confidence
        # band + known-pair anti-join leave far fewer than 12x train).
        # The count is a cheap barrier over the already-filtered relation.
        conf = F.greatest(F.col("proba"), F.lit(1.0) - F.col("proba"))
        if fresh.count() > limit:
            fresh = fresh.orderBy(F.desc(conf), "a", "b").limit(limit)
    return fresh
