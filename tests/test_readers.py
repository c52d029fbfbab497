"""Readers/sinks: CSV drop semantics, seeded split, spec-JSON map records,
model round-trip, iceberg gating."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bigdataentityresolution_spark.sources import readers as R


@pytest.fixture(scope="module")
def labels_csv(tmp_path_factory):
    d = tmp_path_factory.mktemp("labels")
    p = d / "labels.csv"
    p.write_text(
        "left_spec_id,right_spec_id,label\n"
        "a,b,1\n"
        "b,c,0\n"
        "a,z,1\n"       # z unresolvable
        "a,b,banana\n"  # bad label -> skipped
        "a,,1\n"        # null id -> skipped
        "c,d,1\n"
    )
    return str(p)


def test_read_labeled_pairs_drop_semantics(spark, labels_csv):
    records = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "spec_id string")
    got = {
        (r["left_spec_id"], r["right_spec_id"]): r["label"]
        for r in R.read_labeled_pairs(spark, labels_csv, records).collect()
    }
    assert got == {("a", "b"): 1, ("b", "c"): 0, ("c", "d"): 1}


def test_seeded_shuffle_split_deterministic(spark, labels_csv):
    records = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "spec_id string")
    pairs = R.read_labeled_pairs(spark, labels_csv, records)
    s1 = sorted(map(tuple, R.seeded_shuffle_split(pairs, seed=7).collect()))
    s2 = sorted(map(tuple, R.seeded_shuffle_split(pairs, seed=7).collect()))
    assert s1 == s2
    big = spark.range(1000).select(
        F.col("id").cast("string").alias("left_spec_id"),
        (F.col("id") + 1).cast("string").alias("right_spec_id"),
        F.lit(1).alias("label"),
    )
    split = R.seeded_shuffle_split(big, seed=42)
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts == {"train": 600, "test": 200, "val": 200}


@pytest.fixture(scope="module")
def spec_json_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("specs")
    site = d / "www.ebay.com"
    site.mkdir()
    (site / "100.json").write_text(json.dumps({"page title": "Canon EOS 5D", "megapixels": ["22", "22.3"]}))
    (site / "101.json").write_text(json.dumps({"page title": "Nikon D800", "brand": "Nikon"}))
    return str(d)


def test_read_spec_json_map_shape(spark, spec_json_dir):
    specs = R.read_spec_json(spark, os.path.join(spec_json_dir, "*", "*.json"))
    rows = {r["spec_id"]: r["properties"] for r in specs.collect()}
    assert rows["www.ebay.com//100"]["page title"] == ["Canon EOS 5D"]
    assert rows["www.ebay.com//100"]["megapixels"] == ["22", "22.3"]
    assert rows["www.ebay.com//101"]["brand"] == ["Nikon"]


def test_spec_properties_tokens(spark, spec_json_dir):
    specs = R.read_spec_json(spark, os.path.join(spec_json_dir, "*", "*.json"))
    toks = {
        (r["spec_id"], r["token"])
        for r in R.spec_properties_tokens(specs).collect()
    }
    # keys AND values tokenized; "page"/"title" from the key, stopwords dropped
    assert ("www.ebay.com//100", "page") in toks
    assert ("www.ebay.com//100", "canon") in toks
    # "22.3" fails the alnum admission filter (checkWord semantics)
    assert ("www.ebay.com//100", "22") in toks
    assert not any(t == "22.3" for _, t in toks)


def test_matches_sink_roundtrip(spark, tmp_path_factory):
    from bigdataentityresolution_spark.operators.clustering import closure_from_labeled_pairs

    pairs = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("d", "e", 0)],
        "left_spec_id string, right_spec_id string, label int",
    )
    labels, neg = closure_from_labeled_pairs(pairs)
    out = str(tmp_path_factory.mktemp("sink") / "matches")
    R.write_matches(labels, out)
    back = spark.read.csv(out, header=True)
    got = {(r["a"], r["b"]) for r in back.collect()}
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}

    outn = str(tmp_path_factory.mktemp("sink") / "negatives")
    R.write_negatives(labels, neg, outn)
    backn = spark.read.csv(outn, header=True)
    assert {(r["a"], r["b"]) for r in backn.collect()} == {("d", "e")}


def test_model_sink_roundtrip(tmp_path_factory):
    from bigdataentityresolution_spark.operators.scoring import LRModel

    m = LRModel(weights=(1.5, -2.0, 0.25), bias=0.1, threshold=0.44, fit1=10, fit0=7)
    p = str(tmp_path_factory.mktemp("model") / "model.json")
    R.write_model(m, p)
    back = R.read_model(p)
    assert back == m


def test_iceberg_reader_gated(spark):
    with pytest.raises(RuntimeError, match="Iceberg reader unavailable"):
        R.read_iceberg(spark, "prod.catalog.source_files")
