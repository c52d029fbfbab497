"""End-to-end pipeline: F1 vs ground truth + vs label closure, sha
invariant, checkpoint/resume equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataentityresolution_spark.operators import clustering as C
from bigdataentityresolution_spark.plans import pipeline as P


@pytest.fixture(scope="module")
def pipeline_result(spark, tiny_tables):
    files_df, truth_df, pairs_df = tiny_tables
    return P.run_er_pipeline(spark, files_df, pairs_df, workdir=None)


def test_f1_vs_ground_truth(pipeline_result, tiny_tables):
    _, truth_df, _ = tiny_tables
    m = P.pairwise_f1(pipeline_result["labels"], truth_df)
    assert m["f1"] >= 0.99, m


def test_f1_vs_reference_label_closure(spark, pipeline_result, tiny_tables):
    """north_rule parity: the reference's clusters ARE the transitive
    closure of labeled positives (src/main.c steps 4-6). Our final
    clusters must agree with that closure on labeled pairs: every
    closure pair predicted same-cluster (recall 1.0 by construction —
    label edges are must-link), and explicitly-negative pairs must not
    be merged unless the ground truth says otherwise."""
    files_df, truth_df, pairs_df = tiny_tables
    ref_labels, _ = C.closure_from_labeled_pairs(
        pairs_df, nodes=files_df.select("spec_id")
    )
    # all reference within-cluster pairs must be within-cluster for us
    ref_pairs = C.extract_matches(ref_labels).select("a", "b")
    our_pairs = C.extract_matches(pipeline_result["labels"]).select("a", "b")
    missed = ref_pairs.join(our_pairs, ["a", "b"], "left_anti").count()
    assert missed == 0
    # F1 of our clusters vs the closure clusters evaluated on LABELED pairs
    lp = pairs_df.select(
        F.least("left_spec_id", "right_spec_id").alias("a"),
        F.greatest("left_spec_id", "right_spec_id").alias("b"),
        "label",
    ).distinct()
    ours = lp.join(our_pairs.withColumn("pred", F.lit(1)), ["a", "b"], "left").fillna(
        {"pred": 0}
    )
    stats = ours.groupBy("label", "pred").count().collect()
    cm = {(r["label"], r["pred"]): r["count"] for r in stats}
    tp = cm.get((1, 1), 0)
    fp = cm.get((0, 1), 0)
    fn = cm.get((1, 0), 0)
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, cm


def test_f1_holdout_labels(spark, tiny_tables):
    """The STRONG claim: run the pipeline with only the train-split labels
    (60%) and require the scored-edge predictions + closure to recover the
    held-out pairs — F1 vs full ground truth ≥ 0.99."""
    files_df, truth_df, pairs_df = tiny_tables
    train_only = pairs_df.filter(F.col("split") == "train")
    r = P.run_er_pipeline(spark, files_df, train_only, workdir=None)
    m = P.pairwise_f1(r["labels"], truth_df)
    assert m["f1"] >= 0.99, m


def test_model_quality(pipeline_result):
    model = pipeline_result["model"]
    assert model.rounds_trained > 0
    assert 0.2 <= model.threshold <= 0.8


def test_sha_invariant(spark, tiny_tables):
    files_df, _, _ = tiny_tables
    assert P.verify_content_invariant(files_df, files_df) == 0
    tampered = files_df.withColumn(
        "content",
        F.when(F.col("spec_id").startswith("org/name-0000"), F.concat("content", F.lit("x")))
        .otherwise(F.col("content")),
    )
    assert P.verify_content_invariant(files_df, tampered) > 0


def test_checkpoint_resume_equivalence(spark, tiny_tables, tmp_path_factory):
    """Kill-and-resume: a second run over the same workdir must reuse
    every stage (manifest hit) and produce identical clusters."""
    files_df, truth_df, pairs_df = tiny_tables
    wd = str(tmp_path_factory.mktemp("ckpt"))
    cfg = P.ERConfig(self_train=False, newton_rounds=4)
    r1 = P.run_er_pipeline(spark, files_df, pairs_df, workdir=wd, config=cfg)
    labels1 = sorted(map(tuple, r1["labels"].collect()))

    r2 = P.run_er_pipeline(spark, files_df, pairs_df, workdir=wd, config=cfg)
    labels2 = sorted(map(tuple, r2["labels"].collect()))
    assert labels1 == labels2
    resumed = [s for s, m in r2["runner"].manifests.items() if m.get("resumed")]
    assert set(resumed) >= {
        "prep", "blocking", "candidates", "sem_candidates", "closure", "cluster",
    }
    # manifests carry per-partition lineage
    m = r2["runner"].manifests["candidates"]
    assert m["rows"] == sum(p["rows"] for p in m["partitions"])


def test_resume_invalidates_on_config_change(spark, tiny_tables, tmp_path_factory):
    files_df, _, pairs_df = tiny_tables
    wd = str(tmp_path_factory.mktemp("ckpt2"))
    cfg = P.ERConfig(self_train=False, newton_rounds=2)
    P.run_er_pipeline(spark, files_df, pairs_df, workdir=wd, config=cfg)
    cfg2 = P.ERConfig(self_train=False, newton_rounds=2, per_block_cap=32)
    r = P.run_er_pipeline(spark, files_df, pairs_df, workdir=wd, config=cfg2)
    assert r["runner"].manifests["candidates"]["resumed"] is False


def test_filtered_train_prep_feature_parity(spark, tiny_tables):
    """The train path featurizes against a prep restricted (by broadcast
    semi-joins) to the docs the labeled pairs touch. Per-doc compact
    state is a pure function of (doc postings, shared vocab, n_docs,
    prefix, sig), so the features must be BIT-identical to a join
    against the full corpus prep — where "full corpus prep" is built the
    EXACT way run_er_pipeline's prep stage builds it (corpus-wide
    postings → doc_vectors_indexed → join sigs), NOT via
    build_prep_for_docs over all ids: comparing the re-tokenize path
    against itself would let a divergence between the two construction
    paths slip through (ADVICE r3 #3)."""
    from bigdataentityresolution_spark.functions.text import tokenize
    from bigdataentityresolution_spark.operators import blocking as B
    from bigdataentityresolution_spark.operators import scoring as S
    from bigdataentityresolution_spark.operators import tfidf as TI

    files_df, _, pairs_df = tiny_tables
    cfg = P.ERConfig()
    tok = tokenize("content")
    sigs = B.minhash_signatures_df(
        files_df, id_col="spec_id", text_col="content",
        shingle_n=cfg.shingle_n, num_perm=cfg.num_perm, seed=cfg.seed,
        tokenizer=tok,
    ).cache()
    postings_df = TI.postings(
        files_df, id_col="spec_id", text_col="content", tokenizer=tok
    ).cache()
    n_docs = files_df.count()
    vocab_k = min(max(1000, n_docs), 1_000_000) if cfg.vocab_k == "auto" else int(cfg.vocab_k)
    top_vocab = TI.er_vocab(
        TI.vocab(postings_df, n_docs), n_docs, vocab_k, max_df_ratio=cfg.max_df_ratio
    ).cache()

    tp = pairs_df.select(
        F.least("left_spec_id", "right_spec_id").alias("a"),
        F.greatest("left_spec_id", "right_spec_id").alias("b"),
        "label",
    ).distinct()
    ids = (
        tp.select(F.col("a").alias("spec_id"))
        .unionByName(tp.select(F.col("b").alias("spec_id")))
        .distinct()
    )

    # mirror of run_er_pipeline's prep stage (plans/pipeline.py prep()):
    # doc vectors from the CORPUS-WIDE postings relation, left-join onto
    # the prefix projection, empty-map fill, join sigs
    vecs = TI.doc_vectors_indexed(
        postings_df, top_vocab, n_docs, tf_mode=cfg.tf_mode
    ).withColumnRenamed("doc_id", "spec_id")
    empty_map = F.map_from_arrays(
        F.array().cast("array<int>"), F.array().cast("array<float>")
    )
    full_prep = (
        files_df.select(
            "spec_id", F.substring("content", 1, cfg.lev_bound).alias("prefix")
        )
        .join(vecs.hint("shuffle_hash"), "spec_id", "left")
        .withColumn("features", F.coalesce("features", empty_map))
        .join(sigs.hint("shuffle_hash"), "spec_id")
    )
    train_prep = P.build_prep_for_docs(
        files_df, sigs, top_vocab,
        doc_ids=ids, n_docs=n_docs, lev_bound=cfg.lev_bound, tokenizer=tok,
        tf_mode=cfg.tf_mode,
    )
    cols = ["a", "b", "label", *S.FEATURE_COLS]
    f_full = S.pair_features_compact(
        tp, full_prep, num_perm=cfg.num_perm, lev_bound=cfg.lev_bound,
        sig_prefilter=None,
    ).select(*cols)
    f_train = S.pair_features_compact(
        tp, train_prep, num_perm=cfg.num_perm, lev_bound=cfg.lev_bound,
        sig_prefilter=None,
    ).select(*cols)
    assert f_full.count() == f_train.count() == tp.count()
    assert f_full.exceptAll(f_train).count() == 0
    assert f_train.exceptAll(f_full).count() == 0
    for df in (sigs, postings_df, top_vocab):
        df.unpersist()
