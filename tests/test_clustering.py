"""Connected components + labeling semantics vs pure-Python union-find."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdataentityresolution_spark.operators import clustering as C


class UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def py_components(edges, nodes=()):
    uf = UF()
    for a, b in edges:
        uf.union(a, b)
    for n in nodes:
        uf.find(n)
    out = {}
    for x in list(uf.p):
        out[x] = uf.find(x)
    # normalize root to min member
    comp = {}
    for x, r in out.items():
        comp.setdefault(r, []).append(x)
    labels = {}
    for r, members in comp.items():
        m = min(members)
        for x in members:
            labels[x] = m
    return labels


def test_cc_merge_chain(spark):
    """FIXTURES.md merge_chain: {a},{b},{c,d} + (a,b),(b,c) → {a,b,c,d}."""
    edges = spark.createDataFrame([("c", "d"), ("a", "b"), ("b", "c")], "a string, b string")
    nodes = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("e",)], "spec_id string")
    labels = {r["spec_id"]: r["cluster_id"] for r in C.connected_components(edges, nodes).collect()}
    assert labels == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e"}


def test_cc_empty_edge_set_degenerate_plan(spark):
    """An EMPTY edge set collapses to a zero-task LocalTableScan that can
    skip the CollectMetrics nodes — exercising the clustering.py
    Observation-fallback `.collect()` path explicitly (VERDICT r4 #7:
    previously only hit implicitly). Every node must come back a
    singleton and the loop must converge (not run to max_iter)."""
    edges = spark.createDataFrame([], "a string, b string")
    nodes = spark.createDataFrame([("x",), ("y",)], "spec_id string")
    labels = {r["spec_id"]: r["cluster_id"] for r in C.connected_components(edges, nodes).collect()}
    assert labels == {"x": "x", "y": "y"}
    # no-nodes variant: fully empty in, empty out
    assert C.connected_components(edges).count() == 0


@pytest.mark.parametrize("seed", [0, 1])
def test_cc_random_graph_matches_union_find(spark, seed):
    rng = np.random.default_rng(seed)
    n = 200
    nodes = [f"n{i:04d}" for i in range(n)]
    edges = []
    for _ in range(150):
        i, j = rng.integers(0, n, 2)
        if i != j:
            edges.append((nodes[i], nodes[j]))
    # include a long chain — worst case for naive propagation
    chain = [f"c{i:04d}" for i in range(60)]
    edges += list(zip(chain, chain[1:]))
    all_nodes = nodes + chain

    edf = spark.createDataFrame(edges, "a string, b string")
    ndf = spark.createDataFrame([(x,) for x in all_nodes], "spec_id string")
    got = {r["spec_id"]: r["cluster_id"] for r in C.connected_components(edf, ndf).collect()}
    expect = py_components(edges, all_nodes)
    assert got == expect


def test_closure_idempotent(spark):
    """SURVEY.md §5.2 invariant: re-running closure on its own output is a no-op."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "a string, b string"
    )
    labels1 = C.connected_components(edges)
    m = C.extract_matches(labels1).select("a", "b")
    labels2 = C.connected_components(m)
    assert sorted(map(tuple, labels1.collect())) == sorted(map(tuple, labels2.collect()))


def test_closure_with_labels_and_negatives(spark):
    pairs = spark.createDataFrame(
        [
            ("a", "b", 1),
            ("b", "c", 1),
            ("d", "e", 1),
            ("a", "d", 0),  # cannot-link between {a,b,c} and {d,e}
            ("b", "c", 0),  # contradictory: same cluster — dropped
        ],
        "left_spec_id string, right_spec_id string, label int",
    )
    labels, neg = C.closure_from_labeled_pairs(pairs)
    lmap = {r["spec_id"]: r["cluster_id"] for r in labels.collect()}
    assert lmap["a"] == lmap["b"] == lmap["c"]
    assert lmap["d"] == lmap["e"] != lmap["a"]
    negs = [(r["cid_a"], r["cid_b"]) for r in neg.collect()]
    assert negs == [(lmap["a"], lmap["d"])]


def test_extract_matches_and_negatives(spark):
    pairs = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("d", "e", 1), ("a", "d", 0)],
        "left_spec_id string, right_spec_id string, label int",
    )
    labels, neg = C.closure_from_labeled_pairs(pairs)
    matches = {(r["a"], r["b"]) for r in C.extract_matches(labels).collect()}
    assert matches == {("a", "b"), ("a", "c"), ("b", "c"), ("d", "e")}
    negatives = {(r["a"], r["b"]) for r in C.extract_negatives(labels, neg).collect()}
    # cartesian of {a,b,c} × {d,e}
    assert negatives == {(x, y) for x in "abc" for y in "de"}


def test_extract_strong_matches_floor(spark):
    """getStrongMatches semantics (disabled in the reference build,
    src/functs.c:2137-2199): keep scored pairs with proba >= floor,
    inclusive at the boundary, schema (a, b, proba)."""
    scored = spark.createDataFrame(
        [("a", "b", 0.99), ("c", "d", 0.85), ("e", "f", 0.8499), ("g", "h", 0.1)],
        "a string, b string, proba double",
    )
    out = C.extract_strong_matches(scored, proba_floor=0.85)
    assert out.columns == ["a", "b", "proba"]
    got = {(r["a"], r["b"]): r["proba"] for r in out.collect()}
    assert got == {("a", "b"): 0.99, ("c", "d"): 0.85}


def test_label_candidate_pairs_ispair_semantics(spark):
    pairs = spark.createDataFrame(
        [("a", "b", 1), ("d", "e", 1), ("a", "d", 0)],
        "left_spec_id string, right_spec_id string, label int",
    )
    labels, neg = C.closure_from_labeled_pairs(pairs)
    cand = spark.createDataFrame(
        [("a", "b"), ("b", "d"), ("a", "z")], "a string, b string"
    )
    # "z" unknown → dropped on the inner join; (b,d) negatively linked → 0
    got = {(r["a"], r["b"]): r["label"] for r in C.label_candidate_pairs(cand, labels, neg).collect()}
    assert got == {("a", "b"): 1, ("b", "d"): 0}
