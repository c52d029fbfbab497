"""Deterministic synthetic source-code corpus with known ground-truth clusters.

Analog of the reference's input (2013_camera_specs JSON corpus +
sigmod labelled CSV, src/functs.c:33-160,539-675) adapted to the target
input shape: an Iceberg-style table
``(repo, path, commit, lang, content)`` (BASELINE.json input_hint), plus

- ``truth(spec_id, cluster_id)``   — ground-truth entity labels
- ``labeled_pairs(left_spec_id, right_spec_id, label)`` — the labels CSV
  analog, sampled *within blocking-compatible groups* (north_rule:
  "labeled pairs drawn at the same blocking key") with a seeded 60/20/20
  split mirroring src/main.c:33-34.

Clusters are a seed file plus mutated clones: identifier renames,
function reordering, whitespace/comment edits — the classic near-dup
transformations. Repo sizes are Zipfian so blocking keys have hot spots
(skew-handling exercise, SURVEY.md §7.2).

Everything derives from a single ``numpy.random.Generator(seed)``; same
seed → byte-identical corpus. No external data.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np

_LANGS = ("py", "c", "java", "js", "md")

_IDENT_POOL = [
    "buffer", "cursor", "handle", "index", "offset", "stride", "payload",
    "packet", "worker", "parser", "lexer", "token", "symbol", "scope",
    "frame", "stack", "queue", "cache", "shard", "chunk", "batch", "record",
    "field", "column", "filter", "mapper", "reducer", "writer", "reader",
    "stream", "socket", "config", "option", "result", "status", "error",
]

_VERB_POOL = [
    "init", "open", "close", "read", "write", "flush", "parse", "emit",
    "merge", "split", "scan", "seek", "load", "store", "update", "delete",
    "insert", "lookup", "hash", "sort", "pack", "unpack", "encode", "decode",
]


@dataclass
class Corpus:
    """Generated corpus + ground truth, as plain Python lists of tuples."""

    files: list[tuple[str, str, str, str, str]]  # repo, path, commit, lang, content
    truth: list[tuple[str, int]]  # spec_id, cluster_id
    pairs: list[tuple[str, str, int, str]]  # left, right, label, split(train/test/val)
    meta: dict = field(default_factory=dict)

    @staticmethod
    def spec_id(repo: str, path: str, commit: str) -> str:
        # reference specID = "<site>//<file>" (src/functs.c:111-117)
        return f"{repo}//{path}@{commit}"


def _make_function(rng: np.random.Generator, idents: list[str]) -> list[str]:
    verb = _VERB_POOL[rng.integers(0, len(_VERB_POOL))]
    noun = idents[rng.integers(0, len(idents))]
    arg1 = idents[rng.integers(0, len(idents))]
    arg2 = idents[rng.integers(0, len(idents))]
    body_n = int(rng.integers(3, 8))
    lines = [f"def {verb}_{noun}({arg1}, {arg2}):"]
    for _ in range(body_n):
        a = idents[rng.integers(0, len(idents))]
        b = idents[rng.integers(0, len(idents))]
        op = ["+", "-", "*", "|"][rng.integers(0, 4)]
        lines.append(f"    {a} = {b} {op} {int(rng.integers(1, 100))}")
    lines.append(f"    return {arg1}")
    return lines


def _diverse_idents(rng: np.random.Generator, n: int = 8) -> list[str]:
    """Identifiers with a numeric suffix — approximates real code's
    heavy-tailed identifier space (a file's idents are mostly unique to
    it). The base pool alone makes every file share most of its token
    vocabulary with every other file, which no real corpus does; the
    HARD tier uses these so lexical statistics (IDF, cosine) behave the
    way they do on real source code."""
    pool = list(rng.choice(_IDENT_POOL, size=n, replace=False))
    return [f"{w}_{int(rng.integers(100, 9999))}" for w in pool]


def _make_seed_content(
    rng: np.random.Generator, diverse_idents: bool = False
) -> tuple[str, list[list[str]]]:
    idents = (
        _diverse_idents(rng)
        if diverse_idents
        else list(rng.choice(_IDENT_POOL, size=8, replace=False))
    )
    n_funcs = int(rng.integers(2, 5))
    funcs = [_make_function(rng, idents) for _ in range(n_funcs)]
    header = [f"# module {idents[0]}_{idents[1]}", ""]
    content = "\n".join(header + [ln for fn in funcs for ln in fn + [""]])
    return content, funcs


def _mutate(rng: np.random.Generator, funcs: list[list[str]]) -> str:
    """Clone mutation: rename one identifier, maybe reorder functions,
    whitespace/comment edits. Token overlap with the seed stays high."""
    funcs = [list(fn) for fn in funcs]
    old = _IDENT_POOL[rng.integers(0, len(_IDENT_POOL))]
    new = old + str(int(rng.integers(2, 9)))
    funcs = [[ln.replace(old, new) for ln in fn] for fn in funcs]
    if rng.random() < 0.5 and len(funcs) > 1:
        order = rng.permutation(len(funcs))
        funcs = [funcs[i] for i in order]
    lines = [ln for fn in funcs for ln in fn + [""]]
    if rng.random() < 0.5:
        lines.insert(0, f"# edited revision {int(rng.integers(1, 100))}")
    if rng.random() < 0.3:
        lines = [ln + ("  " if rng.random() < 0.1 else "") for ln in lines]
    return "\n".join(["# module clone", ""] + lines)


def _unrelated(rng: np.random.Generator, diverse_idents: bool = False) -> str:
    content, _ = _make_seed_content(rng, diverse_idents=diverse_idents)
    extra = " ".join(
        str(rng.choice(_VERB_POOL)) + str(int(rng.integers(0, 1000))) for _ in range(20)
    )
    return content + "\n# " + extra


def generate_corpus(
    n_clusters: int = 40,
    clones_per_cluster: tuple[int, int] = (2, 6),
    n_unrelated: int = 60,
    n_repos: int = 12,
    seed: int = 42,
    neg_pairs_per_cluster: int = 3,
) -> Corpus:
    """Build the corpus. Defaults ≈ FIXTURES.md 'tiny' (~200 files)."""
    rng = np.random.default_rng(seed)

    # Zipfian repo assignment → hot blocking keys (FIXTURES.md §1).
    repo_weights = 1.0 / np.arange(1, n_repos + 1)
    repo_weights /= repo_weights.sum()
    repos = [f"org/name-{i:04d}" for i in range(n_repos)]

    files: list[tuple[str, str, str, str, str]] = []
    truth: list[tuple[str, int]] = []
    clusters: list[list[str]] = []

    def commit_hex() -> str:
        return bytes(rng.integers(0, 256, size=20, dtype=np.uint8)).hex()

    fidx = 0
    for cid in range(n_clusters):
        seed_content, funcs = _make_seed_content(rng)
        n_clones = int(rng.integers(clones_per_cluster[0], clones_per_cluster[1] + 1))
        members: list[str] = []
        for j in range(n_clones):
            repo = repos[rng.choice(n_repos, p=repo_weights)]
            lang = _LANGS[rng.integers(0, len(_LANGS))]
            path = f"src/mod_{cid:04d}/file_{fidx}.{lang}"
            commit = commit_hex()
            content = seed_content if j == 0 else _mutate(rng, funcs)
            files.append((repo, path, commit, lang, content))
            sid = Corpus.spec_id(repo, path, commit)
            truth.append((sid, cid))
            members.append(sid)
            fidx += 1
        clusters.append(members)

    for _ in range(n_unrelated):
        repo = repos[rng.choice(n_repos, p=repo_weights)]
        lang = _LANGS[rng.integers(0, len(_LANGS))]
        path = f"src/misc/file_{fidx}.{lang}"
        commit = commit_hex()
        files.append((repo, path, commit, lang, _unrelated(rng)))
        sid = Corpus.spec_id(repo, path, commit)
        truth.append((sid, n_clusters + len(truth)))  # singleton cluster ids
        fidx += 1

    # Labeled pairs: positives within clusters, negatives across clusters
    # that share vocabulary (same seed-pool idents → frequently same LSH
    # band → "labeled pairs at the same blocking key").
    pairs: list[tuple[str, str, int]] = []
    for members in clusters:
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.append((members[i], members[j], 1))
    for ci in range(n_clusters):
        for _ in range(neg_pairs_per_cluster):
            cj = int(rng.integers(0, n_clusters))
            if cj == ci:
                continue
            a = clusters[ci][int(rng.integers(0, len(clusters[ci])))]
            b = clusters[cj][int(rng.integers(0, len(clusters[cj])))]
            pairs.append((a, b, 0))

    # Seeded shuffle + 60/20/20 byte-order split (reference
    # shuffleCSV + TRAIN_PERC/TEST_PERC, src/main.c:33-34).
    order = rng.permutation(len(pairs))
    shuffled = [pairs[i] for i in order]
    n = len(shuffled)
    split_pairs = []
    for i, (a, b, lbl) in enumerate(shuffled):
        split = "train" if i < 0.6 * n else ("test" if i < 0.8 * n else "val")
        split_pairs.append((a, b, lbl, split))

    return Corpus(
        files=files,
        truth=truth,
        pairs=split_pairs,
        meta={
            "n_clusters": n_clusters,
            "n_files": len(files),
            "n_pairs": len(split_pairs),
            "seed": seed,
        },
    )


def _mutate_hard(
    rng: np.random.Generator, funcs: list[list[str]], idents: list[str], strength: float
) -> str:
    """Adversarial clone mutation with a tunable ``strength`` in [0, 1].

    Beyond :func:`_mutate` (rename + reorder + whitespace), this deletes
    functions, REWRITES whole function bodies (fresh assignments — new
    shingles), and renames several identifiers at once. At strength
    ≈ 0.4-0.6 the 2-shingle Jaccard of clone↔seed lands near the
    pipeline's est-Jaccard admission floor (0.45); at strength ≈ 0.9
    it falls below the candidate prefilter entirely — used by the HARD
    corpus tier to make a perfect pairwise score unattainable by
    construction (VERDICT r3 'Next' #1)."""
    funcs = [list(fn) for fn in funcs]
    # delete up to strength-fraction of functions (always keep one)
    n_del = min(len(funcs) - 1, int(round(strength * (len(funcs) - 1))))
    if n_del > 0:
        keep_idx = sorted(rng.permutation(len(funcs))[: len(funcs) - n_del])
        funcs = [funcs[i] for i in keep_idx]
    # rewrite bodies: each kept function's body is regenerated with
    # probability `strength` (def line kept — the entity's "interface"
    # survives, its implementation diverges)
    rewritten = []
    for fn in funcs:
        if rng.random() < strength:
            body_n = int(rng.integers(3, 8))
            lines = [fn[0]]
            for _ in range(body_n):
                a = idents[rng.integers(0, len(idents))]
                b = idents[rng.integers(0, len(idents))]
                op = ["+", "-", "*", "|"][rng.integers(0, 4)]
                lines.append(f"    {a} = {b} {op} {int(rng.integers(1, 100))}")
            lines.append(fn[-1])
            rewritten.append(lines)
        else:
            rewritten.append(fn)
    # rename 1 + strength*3 identifiers corpus-pool-wide
    for _ in range(1 + int(round(strength * 3))):
        old = _IDENT_POOL[rng.integers(0, len(_IDENT_POOL))]
        new = old + str(int(rng.integers(2, 9)))
        rewritten = [[ln.replace(old, new) for ln in fn] for fn in rewritten]
    if rng.random() < 0.5 and len(rewritten) > 1:
        order = rng.permutation(len(rewritten))
        rewritten = [rewritten[i] for i in order]
    lines = [ln for fn in rewritten for ln in fn + [""]]
    if rng.random() < 0.5:
        lines.insert(0, f"# hard revision {int(rng.integers(1, 100))}")
    return "\n".join(["# module clone", ""] + lines)


def _make_template_header(
    rng: np.random.Generator, n_lines: int = 24, rare_tokens: bool = False
) -> list[str]:
    """A deterministic license/boilerplate header block (~n_lines comment
    lines). Files sharing a header are DISTINCT entities with high raw
    token overlap — the adversarial template-similar non-clone case.

    rare_tokens=False (the GLOBAL boilerplate): every word is drawn from
    the same pools the function bodies use corpus-wide, so the header's
    tokens have high document frequency → low IDF → TF-IDF weighting
    (and the significance-based vocabulary prune) discounts them — the
    engine's real-world defense against boilerplate, exercised honestly.
    rare_tokens=True (group-UNIQUE boilerplate): lines carry random
    integers that appear nowhere else, so IDF *boosts* them and the
    mates' TF-IDF cosine approaches 1.0 — the genuinely hard precision
    case no weighting scheme can defuse (kept to a bounded handful of
    groups).
    """
    w = list(rng.choice(_IDENT_POOL, size=6, replace=False))
    lines = [f"# copyright the {w[0]} {w[1]} project all rights reserved"]
    for _ in range(n_lines - 1):
        a = _IDENT_POOL[rng.integers(0, len(_IDENT_POOL))]
        b = _IDENT_POOL[rng.integers(0, len(_IDENT_POOL))]
        v = _VERB_POOL[rng.integers(0, len(_VERB_POOL))]
        v2 = _VERB_POOL[rng.integers(0, len(_VERB_POOL))]
        rare = f" clause {int(rng.integers(1, 999))}" if rare_tokens else ""
        lines.append(f"# you may {v} and {v2} the {a} {b}{rare} notice")
    return lines


def _template_member(rng: np.random.Generator, header: list[str]) -> str:
    """One distinct entity under a shared boilerplate header: the header
    is byte-identical across the group; the body (2 small functions) is
    unique. Body sized so member↔member 2-shingle Jaccard lands in
    ~[0.25, 0.45] — above the candidate prefilter (0.2), straddling the
    est-Jaccard admission floor (0.45): these pairs BECOME candidates and
    the scorer/floors must reject them."""
    idents = _diverse_idents(rng)
    funcs = [_make_function(rng, idents) for _ in range(2)]
    body = [ln for fn in funcs for ln in fn + [""]]
    return "\n".join(header + [""] + body)


def generate_hard_corpus(
    n_hard_clusters: int = 80,
    hard_labeled_frac: float = 0.4,
    n_orphan_clusters: int = 20,
    n_template_groups: int = 24,
    template_group_size: int = 6,
    n_unique_header_groups: int = 4,
    hot_block_size: int = 48,
    n_unrelated: int = 150,
    n_repos: int = 12,
    seed: int = 1337,
    neg_pairs_per_group: int = 4,
    cross_neg_pairs: int | None = None,
) -> Corpus:
    """The HARD adversarial corpus tier (VERDICT r3 'Next' #1): sized so
    pairwise F1 = 1.0 is NOT attainable by construction, breaking the
    bench's metric ceiling so precision/recall regressions are visible.

    Components:
    - ``n_hard_clusters`` true-clone clusters under MEDIUM adversarial
      mutation (strength ~U[0.3, 0.6]: function deletion, body rewrites,
      multi-identifier renames) — findable but not trivially. Only
      ``hard_labeled_frac`` of these clusters contribute labeled pairs;
      the rest must be DISCOVERED by blocking + scoring (must-link label
      edges cannot carry them).
    - ``n_orphan_clusters`` UNLABELED clusters under HEAVY mutation
      (strength ~U[0.8, 0.95]): clone↔seed shingle Jaccard falls below
      the candidate prefilter, so no blocking/scoring configuration with
      the engine's floors can link them → measured recall < 1.0 by
      construction.
    - ``n_template_groups`` groups of DISTINCT entities sharing one
      GLOBAL boilerplate header (license text): high raw token overlap,
      but the shared tokens appear corpus-wide, so TF-IDF weighting
      collapses their cosine — the engine's IDF design is what defuses
      them. ``n_unique_header_groups`` of the groups instead get a
      GROUP-UNIQUE header (rare boilerplate → high IDF → cosine ~0.9
      between non-clones): the genuinely hard precision case.
    - one HOT template group of ``hot_block_size`` members (same global
      header) — a pathological blocking key exercising the per-block cap
      inside the full pipeline.
    - labeled NEGATIVE pairs are drawn within template groups and the hot
      block (same blocking key — the north rule's "labeled pairs at the
      same blocking key"), plus positives from the labeled hard clusters.

    Truth: hard/orphan cluster members share a cluster id; every
    template/hot/unrelated file is a singleton entity.
    """
    rng = np.random.default_rng(seed)
    repo_weights = 1.0 / np.arange(1, n_repos + 1)
    repo_weights /= repo_weights.sum()
    repos = [f"org/name-{i:04d}" for i in range(n_repos)]

    files: list[tuple[str, str, str, str, str]] = []
    truth: list[tuple[str, int]] = []
    pos_pairs: list[tuple[str, str, int]] = []
    neg_pairs: list[tuple[str, str, int]] = []
    next_cid = 0
    fidx = 0
    orphan_pair_count = 0

    def commit_hex() -> str:
        return bytes(rng.integers(0, 256, size=20, dtype=np.uint8)).hex()

    def add_file(kind: str, content: str, cid: int) -> str:
        nonlocal fidx
        repo = repos[rng.choice(n_repos, p=repo_weights)]
        lang = _LANGS[rng.integers(0, len(_LANGS))]
        path = f"src/{kind}/file_{fidx}.{lang}"
        commit = commit_hex()
        files.append((repo, path, commit, lang, content))
        sid = Corpus.spec_id(repo, path, commit)
        truth.append((sid, cid))
        fidx += 1
        return sid

    # -- hard clusters (medium mutation; a fraction labeled) ------------
    hard_members: list[list[str]] = []
    for _ in range(n_hard_clusters):
        idents = _diverse_idents(rng)
        n_funcs = int(rng.integers(2, 5))
        funcs = [_make_function(rng, idents) for _ in range(n_funcs)]
        seed_content = "\n".join(
            [f"# module {idents[0]} {idents[1]}", ""]
            + [ln for fn in funcs for ln in fn + [""]]
        )
        cid = next_cid
        next_cid += 1
        labeled = rng.random() < hard_labeled_frac
        members = [add_file(f"hard_{cid:05d}", seed_content, cid)]
        for _ in range(int(rng.integers(2, 5))):
            strength = float(rng.uniform(0.3, 0.6))
            members.append(
                add_file(f"hard_{cid:05d}", _mutate_hard(rng, funcs, idents, strength), cid)
            )
        hard_members.append(members)
        if labeled:
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    pos_pairs.append((members[i], members[j], 1))

    # -- ORDINARY cross-cluster labeled negatives -------------------------
    # The labeled-negative distribution must be DIVERSE, not template-only.
    # Measured r4 failure mode: when every labeled negative was a
    # template-similar pair (high cosine/lev), the LR learned NEGATIVE
    # weights on all three similarity features ("dissimilar ⇒ match") and
    # assigned proba ≈ 1.0 to arbitrary cross-cluster pairs. Cross-cluster
    # negatives anchor the decision boundary the way any real labeling
    # process (which samples candidate pairs, most of them ordinary
    # non-matches) would.
    if cross_neg_pairs is None:
        cross_neg_pairs = n_hard_clusters
    for _ in range(cross_neg_pairs):
        ci = int(rng.integers(0, n_hard_clusters))
        cj = int(rng.integers(0, n_hard_clusters))
        if ci == cj:
            continue
        a = hard_members[ci][int(rng.integers(0, len(hard_members[ci])))]
        b = hard_members[cj][int(rng.integers(0, len(hard_members[cj])))]
        a, b = sorted((a, b))
        neg_pairs.append((a, b, 0))

    # -- orphan clusters (heavy mutation, NEVER labeled) ----------------
    for _ in range(n_orphan_clusters):
        idents = _diverse_idents(rng)
        n_funcs = int(rng.integers(2, 5))
        funcs = [_make_function(rng, idents) for _ in range(n_funcs)]
        seed_content = "\n".join(
            [f"# module {idents[0]} {idents[1]}", ""]
            + [ln for fn in funcs for ln in fn + [""]]
        )
        cid = next_cid
        next_cid += 1
        members = [add_file(f"orphan_{cid:05d}", seed_content, cid)]
        for _ in range(int(rng.integers(1, 3))):
            strength = float(rng.uniform(0.8, 0.95))
            members.append(
                add_file(f"orphan_{cid:05d}", _mutate_hard(rng, funcs, idents, strength), cid)
            )
        orphan_pair_count += len(members) * (len(members) - 1) // 2

    # -- template groups (distinct entities, shared boilerplate) --------
    global_header = _make_template_header(rng, rare_tokens=False)
    group_sizes = [template_group_size] * n_template_groups + [hot_block_size]
    for g, size in enumerate(group_sizes):
        unique_header = g < n_unique_header_groups  # hot block is always global
        header = (
            _make_template_header(rng, rare_tokens=True)
            if unique_header
            else global_header
        )
        members = []
        for _ in range(size):
            cid = next_cid
            next_cid += 1
            members.append(
                add_file(
                    f"tmpl_{g:04d}" + ("_hot" if size == hot_block_size else ""),
                    _template_member(rng, header),
                    cid,
                )
            )
        # labeled negatives WITHIN the group — same blocking key by
        # construction (shared header dominates the MinHash bands)
        for _ in range(neg_pairs_per_group):
            i, j = rng.integers(0, size), rng.integers(0, size)
            if i != j:
                a, b = sorted((members[int(i)], members[int(j)]))
                neg_pairs.append((a, b, 0))

    # -- unrelated singletons -------------------------------------------
    for _ in range(n_unrelated):
        cid = next_cid
        next_cid += 1
        add_file("misc", _unrelated(rng, diverse_idents=True), cid)

    # -- seeded shuffle + 60/20/20 split ---------------------------------
    pairs = pos_pairs + neg_pairs
    order = rng.permutation(len(pairs))
    shuffled = [pairs[i] for i in order]
    n = len(shuffled)
    split_pairs = [
        (a, b, lbl, "train" if i < 0.6 * n else ("test" if i < 0.8 * n else "val"))
        for i, (a, b, lbl) in enumerate(shuffled)
    ]

    return Corpus(
        files=files,
        truth=truth,
        pairs=split_pairs,
        meta={
            "tier": "hard",
            "n_files": len(files),
            "n_pairs": len(split_pairs),
            "n_hard_clusters": n_hard_clusters,
            "n_orphan_clusters": n_orphan_clusters,
            "orphan_pair_count": orphan_pair_count,
            "n_template_groups": n_template_groups + 1,
            "n_unique_header_groups": n_unique_header_groups,
            "hot_block_size": hot_block_size,
            "seed": seed,
        },
    )


def generate_hotkey_corpus(
    n_hot: int = 12000, n_background: int = 12000, seed: int = 7
) -> Corpus:
    """Pathological hot-blocking-key corpus for the SURVEY §7.2 hot-key
    bench (VERDICT r3 'Next' #2; reference analog: the 4-bucket stripes +
    global pairs_limit, src/functs.c:1752-1768,1718).

    ``n_hot`` files share a byte-identical ~30-line license header with a
    1-line unique tail → pairwise shingle Jaccard ≈ 0.95, so nearly all
    of them land in the SAME LSH block in every band — the 10k-member
    block a license header produces at corpus scale. ``n_background``
    unrelated files surround it. Truth/pairs are irrelevant here (the
    bench measures candidate generation only) — every file is a
    singleton and the pair list is empty.
    """
    rng = np.random.default_rng(seed)
    header = _make_template_header(rng, n_lines=30)
    files: list[tuple[str, str, str, str, str]] = []
    truth: list[tuple[str, int]] = []

    def commit_hex() -> str:
        return bytes(rng.integers(0, 256, size=20, dtype=np.uint8)).hex()

    for i in range(n_hot):
        content = "\n".join(header + [f"# generated artifact {i} {int(rng.integers(0, 1 << 30))}"])
        repo = f"org/hot-{i % 40:03d}"
        path = f"vendor/licensed/file_{i}.py"
        commit = commit_hex()
        files.append((repo, path, commit, "py", content))
        truth.append((Corpus.spec_id(repo, path, commit), i))
    for i in range(n_background):
        repo = f"org/bg-{i % 40:03d}"
        path = f"src/bg/file_{i}.py"
        commit = commit_hex()
        files.append((repo, path, commit, "py", _unrelated(rng)))
        truth.append((Corpus.spec_id(repo, path, commit), n_hot + i))

    return Corpus(
        files=files, truth=truth, pairs=[],
        meta={"tier": "hotkey", "n_hot": n_hot, "n_background": n_background, "seed": seed},
    )


def corpus_to_spark(spark, corpus: Corpus):
    """(source_files_df, truth_df, pairs_df) Spark DataFrames.

    source_files carries the derived spec_id and the per-row
    sha256(content) invariant column (input_hint)."""
    from pyspark.sql import functions as F

    files_df = spark.createDataFrame(
        corpus.files, schema="repo string, path string, commit string, lang string, content string"
    ).withColumn(
        "spec_id", F.concat_ws("", F.col("repo"), F.lit("//"), F.col("path"), F.lit("@"), F.col("commit"))
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))

    truth_df = spark.createDataFrame(corpus.truth, schema="spec_id string, cluster_id bigint")
    pairs_df = spark.createDataFrame(
        corpus.pairs, schema="left_spec_id string, right_spec_id string, label int, split string"
    )
    return files_df, truth_df, pairs_df


def python_sha256(content: str) -> str:
    """Driver-side oracle for the sha2(content,256) invariant."""
    return hashlib.sha256(content.encode("utf-8")).hexdigest()
