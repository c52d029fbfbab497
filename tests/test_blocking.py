"""Blocking operator tests: recall on ground truth, caps, salting equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataentityresolution_spark.operators import blocking as B


def test_block_membership_shape(spark, tiny_tables):
    files_df, _, _ = tiny_tables
    mem = B.block_membership(files_df, num_perm=16, bands=4)
    rows = mem.limit(10).collect()
    assert set(mem.columns) == {"spec_id", "block_key"}
    assert all(r["block_key"].split(":")[0] in {"0", "1", "2", "3"} for r in rows)
    # every record appears in exactly `bands` blocks
    per_spec = mem.groupBy("spec_id").count().select(F.collect_set("count")).collect()[0][0]
    assert per_spec == [4]


def test_candidate_pairs_ordering_and_dedup(spark):
    mem = spark.createDataFrame(
        [("s1", "k1"), ("s2", "k1"), ("s3", "k1"), ("s1", "k2"), ("s2", "k2")],
        "spec_id string, block_key string",
    )
    pairs = B.candidate_pairs(mem).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    assert got == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}  # deduped across k1/k2
    assert all(a < b for a, b in got)


def test_per_block_cap_bounds_pairs(spark):
    rows = [(f"s{i:03d}", "hot") for i in range(100)]
    mem = spark.createDataFrame(rows, "spec_id string, block_key string")
    n = B.candidate_pairs(mem, per_block_cap=10).count()
    assert n == 45  # 10*9/2, not 4950


def test_blocking_recall_on_truth(spark, tiny_tables):
    """Most true positive pairs must share at least one LSH block
    (north_rule: labeled pairs drawn at the same blocking key)."""
    files_df, truth_df, _ = tiny_tables
    mem = B.block_membership(files_df, shingle_n=2, num_perm=32, bands=16)
    cand = B.candidate_pairs(mem, per_block_cap=128)

    t1 = truth_df.select(F.col("spec_id").alias("a"), F.col("cluster_id").alias("c"))
    t2 = truth_df.select(F.col("spec_id").alias("b"), F.col("cluster_id").alias("c"))
    true_pairs = t1.join(t2, "c").filter(F.col("a") < F.col("b")).select("a", "b")
    n_true = true_pairs.count()
    n_found = true_pairs.join(cand, ["a", "b"], "left_semi").count()
    recall = n_found / n_true
    assert recall >= 0.95, f"blocking recall {recall:.3f} below 0.95 ({n_found}/{n_true})"

    # and blocking must actually block: candidates far below n^2/2
    n_files = files_df.count()
    assert cand.count() < 0.05 * n_files * (n_files - 1) / 2


def test_salted_equals_unsalted(spark, tiny_tables):
    files_df, _, _ = tiny_tables
    mem = B.block_membership(files_df, num_perm=16, bands=4)
    plain = {(r["a"], r["b"]) for r in B.candidate_pairs(mem, per_block_cap=10**6).collect()}
    salted = {
        (r["a"], r["b"])
        for r in B.candidate_pairs_salted(mem, per_block_cap=10**6, salt_buckets=4).collect()
    }
    assert plain == salted
