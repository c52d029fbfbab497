"""The flagship ER pipeline: ingest → TF-IDF prep → LSH blocking →
candidate scoring → transitive clustering, with stage checkpoints.

Spark lifecycle of the reference's main pipeline (src/main.c:46-548,
mapped in SURVEY.md §3.1), re-architected:

  stage        reference                            here
  ------------ ------------------------------------ -------------------------
  ingest       readDataset JSON walk                source table scan +
                                                    sha2(content,256) invariant
  closure      readCSV merge/negative links         connected components over
               (incremental clique merge)           labeled positives
  prep         hash_to_bow + tfidf_apply + top-1000 postings/vocab/doc_vectors
  blocking     hash1 mod 500 buckets                MinHash/LSH band keys
  candidates   bucket-stripe enumeration            capped within-block pairs
  features     concat sparse TF-IDF vectors         cosine/jaccard/levenshtein
  train        Hogwild batched GD                   synchronous IRLS rounds
  score        logistic_predict_proba               JVM sigmoid expression
  self-train   1 retrain round, band [0.85/0.15]    same semantics
  cluster      (clusters == label closure)          label closure ∪ accepted
                                                    predicted edges
  sinks        extractMatches/extractNegatives      same, as DataFrames

Every stage checkpoints through plans.checkpoint.StageRunner; a killed
run resumes at the first stage whose manifest is missing or whose input
fingerprint changed.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataentityresolution_spark.functions.text import tokenize
from bigdataentityresolution_spark.operators import blocking as B
from bigdataentityresolution_spark.operators import clustering as C
from bigdataentityresolution_spark.operators import scoring as S
from bigdataentityresolution_spark.operators import tfidf as TI
from bigdataentityresolution_spark.plans.checkpoint import StageRunner


@dataclass(frozen=True)
class ERConfig:
    shingle_n: int = 2
    # MinHash sketch width / LSH banding. 64 perms in 32 bands × 2 rows
    # (r4; was 32/16): candidate probability at exact-shingle-J
    # 0.15/0.20/0.25 rises 30/48/64% → 52/73/87%, which on the HARD tier
    # bought attainable (hard-kind) pair recall 0.8865 → 0.9708 at
    # precision 0.9997 and +10% easy-bench wall (candidates ×1.9, sketch
    # 256 B/doc — still ~nothing vs content). 96/48 reaches 0.986 at
    # ×2.8 candidates (+43% wall): the recall-critical setting, not the
    # default. Measured: scripts/hard_sweep.py.
    num_perm: int = 64
    bands: int = 32
    per_block_cap: int = 64
    # Vocabulary size for the pair-join TF-IDF vectors. "auto" (default)
    # scales with the corpus: min(max(1000, n_docs), 1_000_000). The
    # reference's fixed MOST_SIGN=1000 (src/boWords.c) is correct for its
    # ~30k-record camera-spec corpus whose natural vocabulary is small,
    # but significance (tfidf_sum_mean) GROWS with document frequency, so
    # over a large code corpus a fixed top-1000 keeps only corpus-common
    # tokens and drops every rare discriminative identifier — measured on
    # the HARD tier (40k files): cross-template non-clone cosine 0.6-0.78,
    # precision 0.005. The 1M cap bounds the vocab-index broadcast
    # (~24 MB); past it, move to feature hashing, not a bigger k.
    vocab_k: int | str = "auto"
    # Drop terms appearing in > this fraction of docs from the ER vocab
    # (boilerplate carries no pairwise discrimination; see tfidf.er_vocab).
    # None disables; the prune auto-falls-back on tiny/common-vocab corpora.
    max_df_ratio: float | None = 0.35
    lev_bound: int = 128
    # Drop candidates with est-Jaccard below this before featurization.
    # 0.12 (r4; was 0.2): at 32 perms the estimator's sampling noise
    # pushed true J≈0.25 pairs under 0.2 (~8% of them); with 64 perms
    # the estimate is tight enough to admit the J 0.12-0.2 band the LSH
    # now surfaces. Measured on the HARD tier: 540 true pairs died at
    # the 0.2 prefilter; lowering it (with the matching override floor)
    # is worth ~3 recall points at unchanged precision — the calibrated
    # override bar, not this filter, is the precision defense.
    sig_prefilter: float = 0.12
    newton_rounds: int = 5  # IRLS is quadratic — 5 rounds reach |step| < 1e-4
    self_train: bool = True
    self_train_limit_factor: int = 12  # pairs_limit = train_size × 12 (src/functs.c:23)
    # Edge decision threshold: "auto" (default) calibrates the
    # F1-maximizing threshold on the labeled train pairs
    # (scoring.calibrate_edge_threshold — the reference's moving
    # threshold climbs to its 0.8 clamp whenever positives outnumber
    # negatives, which zeroes discovery on corpora where the compact
    # model's probabilities don't saturate); a float pins it; None uses
    # model.threshold (reference semantics, pre-r4 default).
    edge_threshold: float | str | None = "auto"
    # Precision-first link policy: a PREDICTED edge must clear BOTH an
    # exact TF-IDF cosine floor and a MinHash est-Jaccard floor, not just
    # the model threshold. Rationale: one false edge chains two clusters
    # under transitive closure — asymmetric, unrecoverable damage — while
    # a missed true edge is healed whenever any other member pair links
    # the clusters. The two floors are INDEPENDENT failure modes:
    # est-Jaccard has a sampling-noise tail (32 perms ⇒ est ≈ 0.3 on
    # J ≈ 0.05 pairs happens ~1e-4, × millions of candidates ⇒ hundreds
    # of false edges) but such pairs have low exact cosine; template-
    # similar corpora produce unrelated pairs with cosine up to ~0.9 but
    # those can't also beat the est-Jaccard floor. Measured on the bench
    # corpus: either floor alone leaves 361/682 false edges, both
    # together leave 0.
    edge_cosine_floor: float | None = 0.5
    edge_jaccard_floor: float | None = 0.45
    # High-confidence override: an edge whose model probability clears
    # this bar is accepted under RELAXED floors (the *_override_* minima
    # below) instead of the full floors. Motivated by the HARD corpus
    # tier (synthetic.generate_hard_corpus): adversarial low-overlap true
    # clones sit at est-Jaccard 0.3-0.45 — under the full floors alone
    # they are unreachable (recall 0.49 measured), while the trained
    # model separates them from template-similar negatives almost
    # perfectly. The override is NEVER floor-free: a model can be trained
    # on labeled pairs whose negatives are all of one shape, and such a
    # model can emit proba ≈ 1.0 for arbitrarily dissimilar pairs
    # (measured r4: an LR fit where every labeled negative was a
    # template pair learned NEGATIVE weights on all three similarity
    # features — "dissimilar ⇒ confident match" — and a floor-free
    # override then merged 4.3k unrelated files into one cluster).
    # The relaxed minima are a structural sanity bar the model cannot
    # override: no edge below them is accepted no matter the score.
    # "auto" (default) calibrates the bar on the labeled pairs
    # (scoring.calibrate_override_bar): the max proba any labeled
    # negative passing the relaxed floors achieves + margin, clamped to
    # [0.8, 0.99] — 0.8 is the reference's own confidence clamp
    # (src/logistic.c:734) kept as the structural minimum. A fixed bar
    # was the r4 failure mode this replaces: true adversarial clones
    # score proba 0.95-0.98 and a hardcoded 0.98 bar rejected every one
    # of them (hard-tier recall 0.69 measured; 0.84 calibrated at the
    # r4 32/16 banding, 0.971 hard-kind at the shipped 64/32 banding —
    # precision 0.9997 throughout). Lowering the bar below the cap
    # requires >= min_n (150, rule-of-three ≲2% tail bound) labeled
    # negatives INSIDE the relaxed region — an empty or thin sample
    # yields the cap, not the floor (measured r4: the standard corpus
    # has zero such negatives yet 117 cross-cluster pairs scoring
    # 0.80-0.898 there — a floor fallback cost precision 1.0 -> 0.970;
    # the tiny hard corpus has 46, and granting on them cost precision
    # 0.95 -> 0.80).
    edge_high_conf_override: float | str | None = "auto"
    # 0.12 in lockstep with sig_prefilter (r4; was 0.2): an edge the
    # prefilter admits must also be ACCEPTABLE, else the featurization
    # was wasted — and the 64-perm estimate at 0.12 is as reliable as
    # the 32-perm one was at 0.2 (same ±1 std-dev band). Precision holds
    # because the calibrated bar re-learns over whatever labeled
    # negatives enter the widened relaxed region.
    edge_override_jaccard_min: float = 0.12
    edge_override_cosine_min: float = 0.35
    # --- SEMANTIC candidate channel (r5; VERDICT r4 'Next' #1) ---------
    # The lexical MinHash channel's measured ceiling is pairs whose
    # shingle Jaccard sits below band reach (hard-tier orphan kind:
    # recall 0.517 at r4) — yet those same pairs keep their rare
    # discriminative identifiers, so their vocab-pruned TF-IDF cosine
    # stays HIGH (measured p10/p50/p90 = 0.63/0.79/0.91,
    # scripts/orphan_channel_diag.py). The second channel blocks on each
    # doc's top-k TF-IDF terms (prefix filtering, PPJoin family —
    # measured 99.8% orphan-pair coverage at ~1x the lexical channel's
    # candidate volume vs 71% at 11x for SimHash-over-TF-IDF bands,
    # scripts/semantic_blocking_probe.py). Candidates from this channel
    # bypass the est-Jaccard prefilter (they are chosen BECAUSE they sit
    # below it); their acceptance gate is the exact TF-IDF cosine + a
    # separately calibrated high-confidence bar (see
    # edge_semantic_override below).
    semantic_channel: bool = True
    semantic_topk: int = 5
    # Hot top-terms are capped like every other channel; 32 (vs the
    # lexical 64) because a term-block's members are ALL mutually
    # candidate — the quadratic term is the whole cost here.
    semantic_block_cap: int = 32
    # A semantic edge must clear this exact-cosine floor AND the
    # calibrated semantic bar. 0.35 aligns with edge_override_cosine_min
    # — deliberately: the labeled negatives that anchor the semantic
    # bar's evidence (template-similar pairs) live at cosine 0.38-0.47
    # on the hard tier, so a higher floor would empty the evidence
    # region and the bar would stay at its cap (no semantic edges).
    edge_semantic_cosine_min: float = 0.35
    # "auto" calibrates on labeled pairs over the region
    # {f_cosine >= edge_semantic_cosine_min} with NO vocab-empty
    # exemption and NO jaccard requirement (calibrate_override_bar with
    # jaccard_min=0, cosine_exempt_empty=False); float pins it; None
    # disables the semantic accept path (the channel then only feeds
    # pairs that some other gate accepts).
    edge_semantic_override: float | str | None = "auto"
    # Submit independent stage groups as CONCURRENT Spark jobs (label
    # closure ∥ corpus prep; training ∥ candidate generation). The DAG's
    # serial stage chain cannot feed a wide cluster by itself — measured
    # at bench scale: >60% executor idle time at local[16] from barrier
    # latency. Job-level parallelism is the reference's own design
    # (threaded jobScheduler, src/jobscheduler.c) re-expressed on Spark's
    # thread-safe scheduler.
    overlap_jobs: bool = True
    # Connected-components loop controls: round bound and reliable-
    # checkpoint cadence. Each `cc_checkpoint_every` rounds the frontier
    # is persisted (parquet when a workdir/checkpoint_dir is set) —
    # amortize by raising the cadence when the checkpoint dir lives on
    # slow object storage; lower it when rounds are huge and lineage
    # re-computation on executor loss would be costlier than the write.
    cc_max_iter: int = 50
    cc_checkpoint_every: int = 2
    # TF weighting for the pair-join TF-IDF vectors: "log" (sublinear
    # damping — the boilerplate defense, see tfidf.doc_vectors_indexed)
    # or "raw" (reference-exact tf/n_tokens).
    tf_mode: str = "log"
    seed: int = 42

    def fingerprint(self, extra: str = "") -> str:
        payload = json.dumps(asdict(self), sort_keys=True) + extra
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


def verify_content_invariant(source: DataFrame, staged: DataFrame, id_col: str = "spec_id") -> int:
    """input_hint invariant: per-row sha2(content,256) equality vs the
    source table. Returns the number of violating rows (0 == pass)."""
    s = source.select(F.col(id_col), F.sha2("content", 256).alias("_sha_src"))
    t = staged.select(F.col(id_col), F.sha2("content", 256).alias("_sha_stage"))
    return (
        s.join(t, id_col, "full")
        .filter(
            F.col("_sha_src").isNull()
            | F.col("_sha_stage").isNull()
            | (F.col("_sha_src") != F.col("_sha_stage"))
        )
        .count()
    )


def build_prep_for_docs(
    files: DataFrame,
    sigs: DataFrame,
    top_vocab: DataFrame,
    doc_ids: DataFrame,
    n_docs: int,
    lev_bound: int,
    tokenizer=None,
    tf_mode: str = "log",
) -> DataFrame:
    """Compact per-doc pair-join state (prefix + int-keyed TF-IDF vector +
    MinHash sig) for ONLY the docs in ``doc_ids`` (one spec_id column).

    Bit-identical per doc to the full-corpus prep stage: per-doc state is
    a pure function of (the doc's own tokens, the SHARED top-k
    vocabulary, n_docs, the doc's prefix and signature) — re-tokenizing
    the selected docs produces exactly the postings rows a filter of the
    corpus-wide postings would, so restricting files/sigs with broadcast
    semi-joins on the id set changes nothing about the values — only how
    much work materializing them costs. Used by the training path so
    featurizing a few thousand labeled pairs never waits on (or
    shuffles) corpus-scale state.
    """
    ids = doc_ids.select("spec_id")
    # Re-tokenize ONLY the selected docs instead of semi-joining the
    # corpus-wide postings relation: postings is |corpus-tokens| rows, so
    # even a broadcast semi-join over it costs full passes (measured: the
    # concurrent train chain spent ~2 postings-cache scans here and
    # became the pipeline tail at 8 cores). A broadcast semi-join on the
    # files table + an explode of the few thousand selected docs is a
    # fraction of one postings pass — and on a real table the semi-join
    # pushes into the scan (DPP/bloom), which a pass over a materialized
    # corpus-wide postings cache never can.
    files_t = files.join(F.broadcast(ids), "spec_id", "left_semi")
    p_t = TI.postings(
        files_t, id_col="spec_id", text_col="content", tokenizer=tokenizer
    )
    vecs = TI.doc_vectors_indexed(p_t, top_vocab, n_docs, tf_mode=tf_mode).withColumnRenamed(
        "doc_id", "spec_id"
    )
    empty_map = F.map_from_arrays(
        F.array().cast("array<int>"), F.array().cast("array<float>")
    )
    return (
        files.join(F.broadcast(ids), "spec_id", "left_semi")
        .select("spec_id", F.substring("content", 1, lev_bound).alias("prefix"))
        .join(vecs, "spec_id", "left")
        .withColumn("features", F.coalesce("features", empty_map))
        .join(sigs.join(F.broadcast(ids), "spec_id", "left_semi"), "spec_id")
    )


def _phase_logger():
    """SPARK_GRAFT_PHASE_LOG=1 → timestamped phase lines on stderr.
    The decomposition tool behind the scaling work: wall attribution of
    driver-side DAG-build/plan time vs cluster-side job time (event logs
    only show the latter — the gaps between jobs are invisible there)."""
    if os.environ.get("SPARK_GRAFT_PHASE_LOG") != "1":
        return lambda msg: None
    t0 = time.time()

    def log(msg: str) -> None:
        print(f"[er-phase +{time.time() - t0:7.2f}s] {msg}", file=sys.stderr, flush=True)

    return log


def run_er_pipeline(
    spark: SparkSession,
    files: DataFrame,
    labeled_pairs: DataFrame,
    workdir: str | None = None,
    config: ERConfig = ERConfig(),
) -> dict:
    """Run the full pipeline; returns dict with labels/matches/model/metrics.

    files: (spec_id, repo, path, commit, lang, content[, content_sha])
    labeled_pairs: (left_spec_id, right_spec_id, label[, split])
    """
    plog = _phase_logger()
    runner = StageRunner(spark, workdir)
    fp_files = config.fingerprint("files")
    tok = tokenize("content")

    # ---- stage: signatures (ONE corpus scan → 256 B sketch per record) ----
    def signatures():
        return B.minhash_signatures_df(
            files, id_col="spec_id", text_col="content",
            shingle_n=config.shingle_n, num_perm=config.num_perm,
            seed=config.seed, tokenizer=tok,
        )

    sigs = runner.run("signatures", signatures, fp_files)

    # ---- stage: postings (the ONLY corpus tokenize+explode pass) -----------
    # Materialized as its own stage: vocab, doc-lengths, and doc-vectors
    # all re-read it. Without this checkpoint the TF-IDF chain re-scans
    # and RE-TOKENIZES the corpus 3-4× (measured: five full corpus scans
    # inside one prep materialization, ~60-100 core-s/run wasted at bench
    # scale — the single largest avoidable CPU block in the event logs).
    postings_df = runner.run(
        "postings",
        lambda: TI.postings(files, id_col="spec_id", text_col="content", tokenizer=tok),
        fp_files,
    )

    # ---- stage: top-k vocabulary (tiny; shared by BOTH prep paths) ---------
    # Materialized as its own stage because the early train-prep path
    # (see train_features) must use the BIT-IDENTICAL vocabulary rows the
    # full corpus prep uses — term indices come from a row_number over
    # this relation, so sharing one cached/checkpointed DataFrame removes
    # any tie-ordering doubt and computes the corpus-wide vocab agg once.
    n_docs = files.count()
    vocab_k = (
        min(max(1000, n_docs), 1_000_000)
        if config.vocab_k == "auto"
        else int(config.vocab_k)
    )
    # index_vocab folded into the stage: the dense term_idx assignment is
    # a single-partition global sort by nature, so it must run ONCE here
    # (cached/checkpointed) — both prep paths then reuse it instead of
    # re-deriving the window per path (measured ~1-2 s each at bench
    # scale, and at production vocab sizes the single-partition sort is
    # exactly the stage to never repeat).
    top_vocab = runner.run(
        "top_vocab",
        lambda: TI.index_vocab(
            TI.er_vocab(
                TI.vocab(postings_df, n_docs),
                n_docs,
                vocab_k,
                max_df_ratio=config.max_df_ratio,
            )
        ),
        fp_files,
    )

    # ---- stage: prep (compact per-doc state: sig + TF-IDF map + prefix) ----
    # Everything a pair shuffle will ever carry. The raw content/token
    # arrays never ride a pair join (measured: full-payload joins spill
    # at multi-million-candidate scale and stop scaling).
    def prep():
        p = postings_df
        # tfidf operators speak "doc_id" internally; map back to spec_id.
        # Int-keyed float vectors: this map rides every pair shuffle —
        # payload size is the scaling lever (see doc_vectors_indexed).
        vecs = TI.doc_vectors_indexed(
            p, top_vocab, n_docs, tf_mode=config.tf_mode
        ).withColumnRenamed("doc_id", "spec_id")
        empty_map = F.map_from_arrays(
            F.array().cast("array<int>"), F.array().cast("array<float>")
        )
        # shuffle_hash hints: these are corpus×corpus equi-joins — the
        # planner must never try to broadcast either side (see
        # pair_features_compact for the measured failure).
        return (
            files.select(
                "spec_id", F.substring("content", 1, config.lev_bound).alias("prefix")
            )
            .join(vecs.hint("shuffle_hash"), "spec_id", "left")
            .withColumn("features", F.coalesce("features", empty_map))
            .join(sigs.hint("shuffle_hash"), "spec_id")
        )

    docs_prep = runner.run("prep", prep, fp_files)

    # ---- stage: blocking membership (projection of the signature table) ----
    membership = runner.run(
        "blocking",
        lambda: B.membership_from_signatures(sigs, bands=config.bands, num_perm=config.num_perm),
        fp_files,
    )

    # ---- stage: candidate pairs --------------------------------------------
    # est-Jaccard is computed in-block at generation time (signatures are
    # already co-located after the membership shuffle) so the similarity
    # join downstream only sees prefilter survivors — see
    # blocking.candidate_pairs_with_est for the measured rationale.
    candidates = runner.run(
        "candidates",
        lambda: B.candidate_pairs_with_est(
            sigs, bands=config.bands, num_perm=config.num_perm,
            per_block_cap=config.per_block_cap,
        ),
        fp_files,
    )

    # ---- stage: SEMANTIC candidates (top-k TF-IDF term blocking) -----------
    # Depends on docs_prep (the int-keyed vectors + sigs), NOT on a new
    # corpus scan: the top-k is an expression-side sort/slice of the map
    # each doc already carries, so the channel costs one blocking shuffle
    # of k rows/doc plus the capped in-block pair explosion. est_j is
    # computed in-block exactly like the lexical channel (sigs ride the
    # membership) so the two channels union on an identical schema.
    sem_candidates = None
    if config.semantic_channel:
        sem_candidates = runner.run(
            "sem_candidates",
            lambda: B.candidate_pairs_with_est_from_membership(
                B.semantic_topk_membership(
                    docs_prep, k=config.semantic_topk, carry_cols=("sig",)
                ),
                num_perm=config.num_perm,
                per_block_cap=config.semantic_block_cap,
            ),
            fp_files,
        )

    # ---- stage: label closure (reference semantics: ALL labels) ------------
    fp_labels = config.fingerprint("labels")

    def closure():
        cc_dir = (
            os.path.join(workdir, f"cc_closure_{fp_labels}") if workdir else None
        )
        labels, neg = C.closure_from_labeled_pairs(
            labeled_pairs,
            nodes=files.select("spec_id"),
            checkpoint_dir=cc_dir,
            max_iter=config.cc_max_iter,
            checkpoint_every=config.cc_checkpoint_every,
        )
        return labels.withColumn("_kind", F.lit("label")).unionByName(
            neg.select(
                F.col("cid_a").alias("spec_id"), F.col("cid_b").alias("cluster_id")
            ).withColumn("_kind", F.lit("neg_edge"))
        )

    # ---- stage: training pairs + features ----------------------------------
    # Train on the train split's labeled pairs (reference: LR trains on
    # pairs among first-60% specs, src/main.c:296-308).
    #
    # The train features come from a FILTERED prep — the per-doc compact
    # state (prefix + TF-IDF vector + sig) built ONLY for the docs the
    # labeled pairs touch, via broadcast semi-joins on the tiny train-doc
    # id set. Per-doc state is a pure function of (that doc's postings,
    # the shared corpus vocabulary, the doc's prefix, the doc's sig), so
    # the features are bit-identical to a join against the full corpus
    # prep (tests/test_pipeline.py asserts this) — but the train+fit
    # chain no longer waits for the corpus-wide prep to materialize: it
    # forks right after the postings/vocab stages and the driver-local
    # IRLS fit runs CONCURRENTLY with the heavy docs_prep job instead of
    # serially after it (measured: the fit added ~5 s of pure critical
    # path at 16 cores). At production scale the same property matters
    # more: training on a few thousand labeled pairs must not gate on
    # featurizing 10^12 docs.
    def train_features():
        lp = labeled_pairs
        if "split" not in lp.columns:
            # default split is the SCALE path: deterministic hash buckets,
            # no global window (seeded_shuffle_split's exact-count split
            # funnels the relation through one partition — kept for tests
            # only, VERDICT.md r1 #5/#10)
            from bigdataentityresolution_spark.sources.readers import hash_split

            lp = hash_split(lp, seed=config.seed)
        lp = lp.filter(F.col("split") == "train")
        tp = lp.select(
            F.least("left_spec_id", "right_spec_id").alias("a"),
            F.greatest("left_spec_id", "right_spec_id").alias("b"),
            "label",
        ).distinct()
        train_prep = build_prep_for_docs(
            files, sigs, top_vocab,
            doc_ids=tp.select(F.col("a").alias("spec_id")).unionByName(
                tp.select(F.col("b").alias("spec_id"))
            ).distinct(),
            n_docs=n_docs,
            lev_bound=config.lev_bound,
            tokenizer=tok,
            tf_mode=config.tf_mode,
        )
        # no prefilter: every labeled pair must be featurized
        return S.pair_features_compact(
            tp, train_prep, num_perm=config.num_perm,
            lev_bound=config.lev_bound, sig_prefilter=None,
        ).select("a", "b", "label", *S.FEATURE_COLS)

    # ---- concurrent job groups ---------------------------------------------
    # Three independent groups:
    #   A) label-closure CC (labeled pairs only — NOT on the final-label
    #      critical path; its output feeds the result dict and sinks)
    #   B) prep → train features + IRLS fit (labeled pairs × docs_prep)
    #   C) candidate generation (signatures only)
    # Dependency-precise forking (r2 event-log finding: group C waited
    # behind the 20 s prep materialization it does not read — candidates
    # depend on `sigs` alone, so only the signature cache is materialized
    # before C forks; the B chain continues on the main thread). Each
    # shared cached stage is materialized exactly once before any
    # dependent forks — concurrent first-touch of an unmaterialized
    # cache would race block computation.
    def run_closure():
        plog("closure: start")
        out = runner.run("closure", closure, fp_labels)
        plog("closure: done")
        return out

    def run_train_and_fit():
        plog("train_features: DAG build start")
        tp = runner.run("train_features", train_features, fp_labels).cache()
        plog("train_features: DAG built, materializing")
        model = S.fit_lr_newton(tp, max_rounds=config.newton_rounds)
        plog("fit: done")
        return tp, model

    def in_pool(name: str, fn):
        """Tag a job group's thread with its own FAIR scheduler pool
        (session sets spark.scheduler.mode=FAIR; fairness is BETWEEN
        pools, so each concurrent group gets one — a short job then gets
        task slots immediately instead of queueing behind every wave of
        a long one). Local properties are per-Python-thread under
        pinned-thread mode (PySpark default)."""

        def wrapped():
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
            try:
                return fn()
            finally:
                spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)

        return wrapped

    # ---- stage: candidate features (declared here so the overlap block
    # can materialize it concurrently with the train+fit join — the
    # features don't read the model; only the cheap predict projection
    # does, so the two tails overlap instead of stacking) ----------------
    def cand_features():
        if sem_candidates is not None:
            # Channel union AFTER the est-Jaccard prefilter: the lexical
            # side keeps only prefilter survivors (~10%) and the semantic
            # side keeps everything (its pairs are chosen BECAUSE they
            # sit below the sketch estimate's reach; their gate is the
            # exact cosine computed downstream), so the dedup shuffle
            # sees ~0.4M rows at bench scale instead of the 4M raw union
            # (measured: filtering after the union cost ~1 full pair
            # shuffle of mostly-dead rows). est_j is a pure function of
            # the pair, so max() is a no-op on duplicates.
            cand = (
                candidates.filter(F.col("est_j") >= F.lit(float(config.sig_prefilter)))
                .unionByName(sem_candidates)
                .groupBy("a", "b")
                .agg(F.max("est_j").alias("est_j"))
            )
            return S.pair_features_from_est(
                cand, docs_prep,
                lev_bound=config.lev_bound, sig_prefilter=None,
            ).select("a", "b", *S.FEATURE_COLS, "f_vocab_cov")
        return S.pair_features_from_est(
            candidates, docs_prep,
            lev_bound=config.lev_bound, sig_prefilter=config.sig_prefilter,
        ).select("a", "b", *S.FEATURE_COLS, "f_vocab_cov")

    cand_feats = runner.run("cand_features", cand_features, fp_files).cache()

    if config.overlap_jobs:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=4) as pool:
            closure_future = pool.submit(in_pool("closure", run_closure))
            plog("sigs.count: start")
            sigs.count()  # the one dependency group C reads
            plog("sigs.count: done; forking candidates")
            cand_future = pool.submit(in_pool("candidates", candidates.count))
            # Group B's SHARED inputs (postings + top-k vocab) materialize
            # once on the main thread, then train+fit forks IMMEDIATELY —
            # its filtered prep reads only vocab/sigs/files (it
            # re-tokenizes the few thousand train docs), so the
            # driver-local IRLS fit overlaps the heavy corpus-wide
            # docs_prep materialization instead of serially following it.
            postings_df.count()
            top_vocab.count()
            plog("postings+vocab: done; forking train+fit")
            fit_future = pool.submit(in_pool("train", run_train_and_fit))
            docs_prep.count()  # the final-labeling path's heavy dependency
            plog("docs_prep.count: done")
            cand_future.result()  # candidates cache materialized (no
            plog("candidates.count: joined")  # first-touch race below)
            candfeat_future = pool.submit(
                in_pool("candfeat", cand_feats.count)
            )
            train_pairs, model = fit_future.result()
            plog("train+fit: joined")
            candfeat_future.result()
            plog("cand_features: materialized")
            closure_raw = closure_future.result()
            plog("closure: joined")
    else:
        closure_raw = run_closure()
        train_pairs, model = run_train_and_fit()

    closure_df = closure_raw.cache()
    label_clusters = closure_df.filter(F.col("_kind") == "label").drop("_kind")
    neg_edges = closure_df.filter(F.col("_kind") == "neg_edge").select(
        F.col("spec_id").alias("cid_a"), F.col("cluster_id").alias("cid_b")
    )

    # ---- stage: scores (cand_feats materialized in the overlap block) ------
    scored = S.predict(cand_feats, model)
    plog("predict: DAG built")

    # ---- stage: one self-training round (count_retrain < 1, src/functs.c:1717)
    if config.self_train:
        train_size = train_pairs.count()
        plog("self_train: train_size counted")
        pseudo = S.self_training_pseudo_labels(
            scored,
            known_pairs=train_pairs.select("a", "b"),
            limit=config.self_train_limit_factor * max(train_size, 1),
        ).select("a", "b", "label", *S.FEATURE_COLS)
        plog("self_train: pseudo DAG built")
        refit_input = train_pairs.select("a", "b", "label", *S.FEATURE_COLS).unionByName(
            pseudo
        )
        model = S.fit_lr_newton(refit_input, max_rounds=config.newton_rounds)
        plog("self_train: refit done")
        scored = S.predict(cand_feats, model)

    # ---- stage: final clustering -------------------------------------------
    # Edges: labeled positives (must-link, ALL splits — reference closure
    # covers 100% of labels) ∪ predicted matches, minus pairs explicitly
    # labeled 0 (we never add a predicted edge a human label contradicts;
    # the reference adds no predicted edges at all).
    if config.edge_threshold == "auto":
        # calibrated on the TRUE labeled pairs (never on pseudo-labels),
        # after the self-train refit if one ran
        thr = S.calibrate_edge_threshold(
            train_pairs.select("label", *S.FEATURE_COLS), model
        )
        plog(f"edge threshold calibrated: {thr:.4f} (model.threshold {model.threshold:.4f})")
    elif config.edge_threshold is not None:
        thr = float(config.edge_threshold)
    else:
        thr = model.threshold

    if config.edge_high_conf_override == "auto":
        override_bar = S.calibrate_override_bar(
            train_pairs.select("label", *S.FEATURE_COLS),
            model,
            jaccard_min=config.edge_override_jaccard_min,
            cosine_min=config.edge_override_cosine_min,
        )
        plog(f"override bar calibrated: {override_bar:.4f}")
    elif config.edge_high_conf_override is not None:
        override_bar = float(config.edge_high_conf_override)
    else:
        override_bar = None

    # Semantic bar: same calibration machinery and evidence gates as the
    # jaccard-relaxed override, over the semantic region {f_cosine >=
    # cmin} with no jaccard requirement and no vocab-empty exemption
    # (zero-cosine pairs are outside a cosine region by definition).
    # The min_n rule-of-three gate carries over unchanged: a corpus whose
    # labeled negatives never reach cosine cmin grants only the 0.99 cap
    # — the semantic path then admits nothing the evidence doesn't
    # support (measured: the hard tier's template-group negatives sit at
    # cosine 0.38-0.47 / proba <= 0.22, so the bar lands at its 0.8
    # structural floor there while orphan true pairs score 0.84+).
    sem_bar = None
    if config.semantic_channel and config.edge_semantic_override is not None:
        if config.edge_semantic_override == "auto":
            sem_bar = S.calibrate_override_bar(
                train_pairs.select("label", *S.FEATURE_COLS),
                model,
                jaccard_min=0.0,
                cosine_min=config.edge_semantic_cosine_min,
                cosine_exempt_empty=False,
            )
            plog(f"semantic bar calibrated: {sem_bar:.4f}")
        else:
            sem_bar = float(config.edge_semantic_override)

    def final_cluster():
        pos_label_edges = labeled_pairs.filter(F.col("label") == 1).select(
            F.least("left_spec_id", "right_spec_id").alias("a"),
            F.greatest("left_spec_id", "right_spec_id").alias("b"),
        )
        neg_label_pairs = labeled_pairs.filter(F.col("label") == 0).select(
            F.least("left_spec_id", "right_spec_id").alias("a"),
            F.greatest("left_spec_id", "right_spec_id").alias("b"),
        )
        accepted = scored.filter(F.col("proba") >= F.lit(float(thr)))
        floor_ok = F.lit(True)
        if config.edge_cosine_floor is not None:
            # The floor's precondition is a meaningful TF-IDF map on both
            # sides: a pair where either doc has an EMPTY vocab projection
            # has f_cosine identically 0 and is exempted (it still must
            # clear the model threshold + est-Jaccard floor) — otherwise
            # vocab-diverse corpora lose recall silently (ADVICE.md r1).
            floor_ok = floor_ok & (
                (F.col("f_cosine") >= F.lit(float(config.edge_cosine_floor)))
                | (F.col("f_vocab_cov") == 0)
            )
        if config.edge_jaccard_floor is not None:
            floor_ok = floor_ok & (
                F.col("f_jaccard") >= F.lit(float(config.edge_jaccard_floor))
            )
        accept_ok = floor_ok
        if override_bar is not None:
            relaxed_ok = (
                (F.col("f_jaccard") >= F.lit(float(config.edge_override_jaccard_min)))
                & (
                    (F.col("f_cosine") >= F.lit(float(config.edge_override_cosine_min)))
                    | (F.col("f_vocab_cov") == 0)
                )
            )
            accept_ok = accept_ok | (
                relaxed_ok & (F.col("proba") >= F.lit(float(override_bar)))
            )
        if sem_bar is not None:
            # SEMANTIC path: exact-cosine floor + calibrated bar, no
            # jaccard requirement — the only gate low-shingle-overlap
            # near-dups (the channel's whole purpose) can clear. Applies
            # uniformly to all scored pairs (policy over feature space,
            # not candidate provenance).
            sem_ok = F.col("f_cosine") >= F.lit(float(config.edge_semantic_cosine_min))
            accept_ok = accept_ok | (sem_ok & (F.col("proba") >= F.lit(float(sem_bar))))
        accepted = accepted.filter(accept_ok)
        pred_edges = accepted.select("a", "b").join(
            neg_label_pairs, ["a", "b"], "left_anti"
        )
        edges = pos_label_edges.unionByName(pred_edges)
        cc_dir = (
            os.path.join(workdir, f"cc_final_{config.fingerprint('cluster' + str(thr) + str(override_bar) + str(sem_bar))}")
            if workdir
            else None
        )
        return C.connected_components(
            edges,
            nodes=files.select("spec_id"),
            checkpoint_dir=cc_dir,
            max_iter=config.cc_max_iter,
            checkpoint_every=config.cc_checkpoint_every,
        )

    plog("final_cluster: start")
    final_labels = runner.run(
        "cluster",
        final_cluster,
        config.fingerprint("cluster" + str(thr) + str(override_bar) + str(sem_bar)),
    )
    plog("final_cluster: done")

    matches = C.extract_matches(final_labels)

    candidates_all = candidates
    if sem_candidates is not None:
        candidates_all = (
            candidates.select("a", "b")
            .unionByName(sem_candidates.select("a", "b"))
            .distinct()
        )

    return {
        "docs_prep": docs_prep,
        "membership": membership,
        "candidates": candidates,
        "sem_candidates": sem_candidates,
        "candidates_all": candidates_all,
        "label_clusters": label_clusters,
        "neg_edges": neg_edges,
        "train_pairs": train_pairs,
        "model": model,
        "scored": scored,
        "edge_threshold": thr,
        "override_bar": override_bar,
        "sem_bar": sem_bar,
        "labels": final_labels,
        "matches": matches,
        "runner": runner,
    }


def labeled_pair_f1(predicted_labels: DataFrame, labeled_pairs: DataFrame) -> dict:
    """Pairwise F1 restricted to the LABELED pairs — the north rule's
    actual criterion ("pairwise F1≥0.99 on labeled pairs drawn at the
    same blocking key").

    predicted same-cluster vs the pair's label. Positive labels are
    must-link edges in the pipeline, so recall here is structural; the
    metric's teeth are on the NEGATIVE side: an explicitly-negative pair
    may never be merged directly (the pipeline anti-joins them out of
    predicted edges), but transitive closure can still chain its two
    sides through falsely-accepted UNLABELED edges — exactly what the
    hard corpus tier's template groups try to force.
    """
    lp = labeled_pairs.select(
        F.least("left_spec_id", "right_spec_id").alias("a"),
        F.greatest("left_spec_id", "right_spec_id").alias("b"),
        "label",
    ).distinct()
    la = predicted_labels.select(F.col("spec_id").alias("a"), F.col("cluster_id").alias("_ca"))
    lb = predicted_labels.select(F.col("spec_id").alias("b"), F.col("cluster_id").alias("_cb"))
    joined = lp.join(la, "a").join(lb, "b").withColumn(
        "pred", (F.col("_ca") == F.col("_cb")).cast("int")
    )
    cm = {
        (r["label"], r["pred"]): r["n"]
        for r in joined.groupBy("label", "pred").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    tp = cm.get((1, 1), 0)
    fp = cm.get((0, 1), 0)
    fn = cm.get((1, 0), 0)
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision, "recall": recall, "f1": f1}


def pairwise_f1(predicted_labels: DataFrame, truth_labels: DataFrame) -> dict:
    """Pairwise precision/recall/F1 of predicted clustering vs truth.

    Both inputs: (spec_id, cluster_id). Pairs = within-cluster pairs
    (a < b). Computed distributed (no collect of pair sets)."""

    def pairs_of(labels: DataFrame) -> DataFrame:
        l1 = labels.select(F.col("spec_id").alias("a"), "cluster_id")
        l2 = labels.select(F.col("spec_id").alias("b"), "cluster_id")
        return l1.join(l2, "cluster_id").filter(F.col("a") < F.col("b")).select("a", "b")

    pred = pairs_of(predicted_labels).cache()
    true = pairs_of(truth_labels).cache()
    tp = pred.join(true, ["a", "b"], "left_semi").count()
    n_pred = pred.count()
    n_true = true.count()
    precision = tp / n_pred if n_pred else 1.0
    recall = tp / n_true if n_true else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp,
        "pred_pairs": n_pred,
        "true_pairs": n_true,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }
