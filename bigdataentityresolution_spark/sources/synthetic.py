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


def _make_seed_content(rng: np.random.Generator) -> tuple[str, list[list[str]]]:
    idents = list(rng.choice(_IDENT_POOL, size=8, replace=False))
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


def _unrelated(rng: np.random.Generator) -> str:
    content, _ = _make_seed_content(rng)
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
