"""LR training/threshold/self-training vs a NumPy oracle (FIXTURES.md lr_batch)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdataentityresolution_spark.operators import scoring as S


def np_fit(x, y, rounds, lr=0.6, stop=0.15):
    """NumPy oracle of the synchronous full-batch GD + reference threshold."""
    w = np.zeros(x.shape[1])
    b = 0.0
    threshold = 0.5
    fit1 = fit0 = 0
    n_pos, n_neg = int(y.sum()), int(len(y) - y.sum())
    for _ in range(rounds):
        proba = 1 / (1 + np.exp(-(b + x @ w)))
        missed = proba - y
        w = w - lr * (x * missed[:, None]).sum(0) / len(y)
        b = b - lr * missed.mean()
        # threshold (logistic_overfit_dataList semantics)
        fit1 += n_pos
        fit0 += n_neg
        if threshold >= 0.8:
            threshold = 0.8
        elif threshold <= 0.2:
            threshold = 0.2
        else:
            if fit1 > fit0:
                rate = float(fit1) if fit0 == 0 else fit1 / fit0
            else:
                rate = -float(fit0) if fit1 == 0 else -fit0 / fit1
            threshold += (threshold / rate) * threshold
        if np.abs(missed).mean() <= stop:
            break
    return w, b, threshold


@pytest.fixture(scope="module")
def separable(spark):
    rng = np.random.default_rng(0)
    n = 600
    y = (rng.random(n) < 0.5).astype(float)
    x = np.zeros((n, 3))
    # matches: high cosine/jaccard/lev; non-matches: low
    for j in range(3):
        x[:, j] = np.where(y == 1, rng.uniform(0.7, 1.0, n), rng.uniform(0.0, 0.35, n))
    rows = [(float(a), float(b), float(c), int(l)) for (a, b, c), l in zip(x, y)]
    df = spark.createDataFrame(rows, "f_cosine double, f_jaccard double, f_lev double, label int")
    return df, x, y


def test_fit_lr_matches_numpy_full_batch(spark, separable):
    """With batch_size >= n (one batch) the applyInPandas gradient equals
    the full-batch NumPy gradient exactly."""
    df, x, y = separable
    model = S.fit_lr(df, max_rounds=2, batch_size=10**6)
    w, b, t = np_fit(x, y, rounds=2)
    assert np.allclose(model.w(), w, atol=1e-12)
    assert abs(model.bias - b) < 1e-12
    assert abs(model.threshold - t) < 1e-12


def test_fit_lr_batched_equals_full_batch(spark, separable):
    """Size-weighted average of per-batch gradients == full-batch gradient
    (same pairs, any partitioning) — so batching must not change the fit."""
    df, x, y = separable
    m_full = S.fit_lr(df, max_rounds=2, batch_size=10**6)
    m_batched = S.fit_lr(df, max_rounds=2, batch_size=100)
    assert np.allclose(m_full.w(), m_batched.w(), atol=1e-9)
    assert abs(m_full.bias - m_batched.bias) < 1e-9


def test_trained_model_separates(spark, separable):
    """Newton/IRLS (the pipeline trainer) must nail a separable problem."""
    df, x, y = separable
    model = S.fit_lr_newton(df, max_rounds=8)
    scored = S.predict(df, model)
    acc = S.accuracy(scored)
    assert acc >= 0.99, f"accuracy {acc}"
    # probabilities should be extreme on both classes
    stats = scored.groupBy("label").agg(F.avg("proba").alias("p")).collect()
    p = {r["label"]: r["p"] for r in stats}
    assert p[1] > 0.9 and p[0] < 0.1


def test_threshold_clamp_bounds():
    m = S.LRModel(threshold=0.85)
    m2 = S.update_threshold(m, 10, 10)
    assert m2.threshold == 0.8
    m3 = S.update_threshold(S.LRModel(threshold=0.15), 10, 10)
    assert m3.threshold == 0.2
    # balanced labels → rate = -1 → threshold decreases by threshold^2...
    m4 = S.update_threshold(S.LRModel(threshold=0.5), 5, 5)
    assert m4.threshold == pytest.approx(0.5 + (0.5 / -1.0) * 0.5)


def test_self_training_band_and_dedup(spark):
    scored = spark.createDataFrame(
        [
            ("a", "b", 0.99),   # confident match
            ("c", "d", 0.90),   # confident match
            ("e", "f", 0.10),   # confident non-match
            ("g", "h", 0.5),    # uncertain — dropped
            ("i", "j", 1.0),    # p == 1.0 excluded (band is half-open)
            ("k", "l", 0.0),    # p == 0.0 excluded
        ],
        "a string, b string, proba double",
    )
    known = spark.createDataFrame([("a", "b")], "a string, b string")
    out = S.self_training_pseudo_labels(scored, known)
    got = {(r["a"], r["b"]): r["label"] for r in out.collect()}
    assert got == {("c", "d"): 1, ("e", "f"): 0}
    capped = S.self_training_pseudo_labels(scored, known, limit=1)
    assert capped.count() == 1
