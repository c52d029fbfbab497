"""HARD adversarial corpus tier (VERDICT r3 'Next' #1).

The base synthetic corpus saturates at pairwise F1 = 1.0, which blinds
the bench to precision/recall regressions. This tier is constructed so
a perfect pairwise score is NOT attainable:

- orphan clusters (heavy mutation, unlabeled) sit below the candidate
  prefilter → guaranteed recall misses;
- template groups (distinct entities under shared boilerplate headers)
  produce non-clone pairs at shingle Jaccard ≈ 0.6 — ABOVE the
  est-Jaccard admission floor — that only TF-IDF weighting and the
  trained scorer can reject;
- the north rule's actual criterion (pairwise F1 ≥ 0.99 on LABELED
  pairs at the same blocking key) must still hold.
"""

from __future__ import annotations

import itertools
import re
from collections import defaultdict

import pytest

from bigdataentityresolution_spark.plans import pipeline as P
from bigdataentityresolution_spark.sources.synthetic import (
    Corpus,
    generate_hard_corpus,
    generate_hotkey_corpus,
)


def _shingle_jaccard(a: str, b: str) -> float:
    def sh(content: str) -> set:
        toks = [t for t in re.split(r"[^a-z0-9]+", content.lower()) if t]
        return set(zip(toks, toks[1:])) or {("", "")}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def hard_corpus():
    return generate_hard_corpus()


@pytest.fixture(scope="module")
def hard_tables(spark, hard_corpus):
    from bigdataentityresolution_spark.sources.synthetic import corpus_to_spark

    files_df, truth_df, pairs_df = corpus_to_spark(spark, hard_corpus)
    return files_df.cache(), truth_df.cache(), pairs_df.cache()


@pytest.fixture(scope="module")
def hard_result(spark, hard_tables):
    files_df, _, pairs_df = hard_tables
    return P.run_er_pipeline(spark, files_df, pairs_df, workdir=None)


def test_hard_corpus_deterministic():
    c1 = generate_hard_corpus(n_hard_clusters=8, n_orphan_clusters=3, n_unrelated=10)
    c2 = generate_hard_corpus(n_hard_clusters=8, n_orphan_clusters=3, n_unrelated=10)
    assert c1.files == c2.files and c1.pairs == c2.pairs


def test_hard_corpus_is_adversarial_by_construction(hard_corpus):
    """The generator must actually produce the adversarial geometry the
    tier promises: sub-prefilter orphan pairs (unreachable → recall
    ceiling < 1) and template non-clone pairs ABOVE the est-Jaccard
    admission floor (reachable → precision stress)."""
    by_sid = {
        Corpus.spec_id(r, p, c): (p, content)
        for r, p, c, _, content in hard_corpus.files
    }
    clusters = defaultdict(list)
    for sid, cid in hard_corpus.truth:
        clusters[cid].append(sid)

    orphan_j, labeled_pair_ids = [], {(a, b) for a, b, _, _ in hard_corpus.pairs}
    for members in clusters.values():
        if len(members) < 2:
            continue
        kind = by_sid[members[0]][0].split("/")[1].split("_")[0]
        for a, b in itertools.combinations(members, 2):
            if kind == "orphan":
                assert (a, b) not in labeled_pair_ids and (b, a) not in labeled_pair_ids
                orphan_j.append(_shingle_jaccard(by_sid[a][1], by_sid[b][1]))
    # a solid block of orphan pairs below the candidate prefilter (0.2):
    # even with MinHash estimation noise they cannot clear the relaxed
    # override floor (0.3), so recall < 1 for ANY shipped edge policy
    assert sum(1 for j in orphan_j if j < 0.15) >= 10, sorted(orphan_j)[:20]

    # template non-clones: same-group pairs must straddle/EXCEED the 0.45
    # est-Jaccard floor, otherwise the floor alone would reject them and
    # the tier wouldn't stress the scorer at all
    tmpl = defaultdict(list)
    for sid, (path, _) in by_sid.items():
        if path.startswith("src/tmpl_"):
            tmpl[path.split("/")[1]].append(sid)
    tj = [
        _shingle_jaccard(by_sid[a][1], by_sid[b][1])
        for members in tmpl.values()
        for a, b in itertools.combinations(sorted(members)[:6], 2)
    ]
    assert sum(1 for j in tj if j >= 0.45) >= len(tj) * 0.8, (min(tj), max(tj))

    # labeled negatives exist within template groups (same blocking key)
    neg = [(a, b) for a, b, lbl, _ in hard_corpus.pairs if lbl == 0]
    assert len(neg) >= 50


def test_hard_north_rule_labeled_pair_f1(hard_result, hard_tables):
    """The north rule: pairwise F1 ≥ 0.99 on the labeled pairs — must
    hold even on the adversarial tier (labeled negatives under shared
    boilerplate may not be chained together transitively)."""
    _, _, pairs_df = hard_tables
    m = P.labeled_pair_f1(hard_result["labels"], pairs_df)
    assert m["f1"] >= 0.99, m


def test_hard_ceiling_is_broken_and_quality_floor_holds(hard_result, hard_tables):
    """The tier's reason to exist: pairwise F1 < 1.0 (the bench metric
    can now move), while precision and F1 stay above regression floors.
    Measured r4 baseline at THIS (tiny, ~700-file) scale with the
    default config: P = 0.939, R = 0.647, F1 = 0.766 — the calibrated
    override bar's min_n=150 evidence gate refuses the tiny corpus's
    46-negative grant (a fragile small-sample fit merged 120 false
    cluster pairs when it was granted), trading recall for precision
    exactly where the evidence is thin. At bench scale (40k files, 381
    in-region labeled negatives) the grant stands and hard-kind recall
    is 0.971 at precision 0.9997 (BENCH/bench_r4_local.json)."""
    _, truth_df, _ = hard_tables
    m = P.pairwise_f1(hard_result["labels"], truth_df)
    assert m["recall"] < 1.0, m  # orphans are unreachable by construction
    assert m["precision"] >= 0.88, m
    assert m["f1"] >= 0.70, m


def test_hard_recall_decomposition_by_kind(hard_result, hard_tables):
    """bench._hard_recall_by_kind attributes the recall gap between
    attainable (hard-kind, medium mutation) and by-construction
    (orphan-kind, below the candidate prefilter) misses. The split must
    cover all true pairs and order correctly: orphans are DESIGNED to be
    less reachable than hard clones."""
    import bench

    _, truth_df, _ = hard_tables
    by_kind = bench._hard_recall_by_kind(hard_result["labels"], truth_df)
    assert set(by_kind) >= {
        "recall_hard", "recall_orphan", "true_pairs_hard", "true_pairs_orphan",
    }
    m = P.pairwise_f1(hard_result["labels"], truth_df)
    assert by_kind["true_pairs_hard"] + by_kind["true_pairs_orphan"] == m["true_pairs"]
    assert by_kind["recall_orphan"] < by_kind["recall_hard"]
    # the weighted kind recalls must reproduce the overall recall
    tp = (
        by_kind["recall_hard"] * by_kind["true_pairs_hard"]
        + by_kind["recall_orphan"] * by_kind["true_pairs_orphan"]
    )
    assert abs(tp / m["true_pairs"] - m["recall"]) < 1e-3


def test_semantic_channel_lifts_orphan_recall(spark):
    """VERDICT r4 #1's done-criterion, pinned as a regression floor: on a
    hard corpus large enough for the calibration evidence gates to grant
    (>=150 labeled train-split negatives inside the semantic cosine
    region — 70 unique-header groups x 4 negs x 0.6 split = ~168), the
    semantic top-k-term channel must make orphan-kind pairs (shingle
    Jaccard BELOW the lexical prefilter by construction) reachable:
    r4's single-channel ceiling was the lexically-reachable ~52%; the
    bench-scale two-channel result is 0.9875 (BENCH_r05). Floor set at
    0.70 so corpus-size noise can't flake the test while any channel
    regression (membership, union, semantic bar) still trips it.
    Precision and the north rule must hold simultaneously."""
    import bench
    from bigdataentityresolution_spark.sources.synthetic import corpus_to_spark

    corpus = generate_hard_corpus(
        n_hard_clusters=600,
        n_orphan_clusters=150,
        n_template_groups=150,
        template_group_size=6,
        n_unique_header_groups=70,
        hot_block_size=100,
        n_unrelated=800,
        n_repos=30,
        seed=4242,
    )
    files_df, truth_df, pairs_df = corpus_to_spark(spark, corpus)
    files_df = files_df.cache()
    result = P.run_er_pipeline(spark, files_df, pairs_df, workdir=None)
    by_kind = bench._hard_recall_by_kind(result["labels"], truth_df)
    m = P.pairwise_f1(result["labels"], truth_df)
    lm = P.labeled_pair_f1(result["labels"], pairs_df)
    result["runner"].release()
    files_df.unpersist()
    assert by_kind["recall_orphan"] >= 0.70, (by_kind, m)
    # Precision floor 0.95, not 0.99: at THIS mid scale (~5k files) the
    # measured false edges come 50/60 from the PRE-EXISTING full-floors
    # path on unique-header template pairs (cos 0.81, est-J 0.63, lev
    # 1.0 — the corpus's by-construction hard precision case, which a
    # noisier mid-scale fit scores proba ~0.55 > the calibrated 0.35
    # threshold), only 10/60 from the semantic path. Bench scale pins
    # precision at 0.9997 (BENCH_r05 er_hard).
    assert m["precision"] >= 0.95, m
    assert lm["f1"] >= 0.99, lm


def test_hotkey_corpus_shape():
    c = generate_hotkey_corpus(n_hot=200, n_background=100, seed=7)
    assert c.meta["n_hot"] == 200 and len(c.files) == 300
    hot = [content for _, p, _, _, content in c.files if p.startswith("vendor/")]
    # byte-identical header block, unique tails
    heads = {content.rsplit("\n", 1)[0] for content in hot}
    tails = {content.rsplit("\n", 1)[1] for content in hot}
    assert len(heads) == 1 and len(tails) == 200
    c2 = generate_hotkey_corpus(n_hot=200, n_background=100, seed=7)
    assert c2.files == c.files
