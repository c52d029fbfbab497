"""Streaming ingest (batch-equivalence) + multimodal binary plumbing."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from bigdataentityresolution_spark.operators import multimodal as M
from bigdataentityresolution_spark.streaming import ingest as SI

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def test_stream_windowed_agg_matches_batch(spark, tmp_path_factory):
    """The streaming tumbling-window plan over static parquet must equal
    the batch groupBy(window) result."""
    src = os.path.join(TESTDATA, "sf0.001", "events.parquet")
    # file-stream sources need a DIRECTORY; stage the single-file table
    path = str(tmp_path_factory.mktemp("events_dir"))
    spark.read.parquet(src).write.mode("overwrite").parquet(path)
    sdf = SI.stream_events_windowed(spark, path)
    SI.run_stream_to_memory(sdf, "stream_out", output_mode="append")
    streamed = {
        (r["win_start"], r["event_type"]): (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM stream_out").collect()
    }
    ev = spark.read.parquet(src)
    batch = {
        (r["win_start"], r["event_type"]): (r["n"], r["total"])
        for r in ev.groupBy(
            F.window("ts", "5 minutes").getField("start").alias("win_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .collect()
    }
    # append mode emits only windows the watermark has CLOSED: with one
    # input batch the watermark rests at max(ts) - 10min, so windows
    # ending after it are (correctly) held back. Everything emitted must
    # match the batch result exactly; everything held back must be a
    # window that isn't closed yet.
    import datetime

    max_ts = ev.agg(F.max("ts")).first()[0]
    horizon = max_ts - datetime.timedelta(minutes=10)
    for key, val in streamed.items():
        assert batch[key] == val, key
    held_back = set(batch) - set(streamed)
    assert held_back, "expected at least the newest window to be held back"
    for win_start, _etype in held_back:
        assert win_start + datetime.timedelta(minutes=5) > horizon


def test_stream_exact_dedup(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_src"))
    df = spark.createDataFrame(
        [("a", "same text"), ("b", "same text"), ("c", "other text")],
        "doc_id string, content string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(d)
    out = SI.stream_exact_dedup(spark, d, "doc_id string, content string")
    SI.run_stream_to_memory(out, "dedup_out", output_mode="append")
    rows = spark.sql("SELECT * FROM dedup_out").collect()
    assert len(rows) == 2  # one per distinct fingerprint
    assert {r["content"] for r in rows} == {"same text", "other text"}


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("m1", "image", b"\x89PNG fake bytes 1", ("image/png", 64, 64, None)),
        ("m2", "image", b"\x89PNG fake bytes 2", ("image/png", 32, 32, None)),
        ("m3", "audio", b"RIFF fake wav", ("audio/wav", None, None, 2500)),
        ("m4", "video", b"\x00\x00ftyp fake mp4", ("video/mp4", 640, 480, 3500)),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_extract_media_features_shapes(spark, media_df):
    feats = M.extract_media_features(media_df).collect()
    assert len(feats) == 4
    by_id = {r["media_id"]: r for r in feats}
    assert all(len(r["features"]) == M.FEATURE_DIM for r in feats)
    assert by_id["m1"]["payload_sha"] == hashlib.sha256(b"\x89PNG fake bytes 1").hexdigest()
    assert by_id["m1"]["n_bytes"] == len(b"\x89PNG fake bytes 1")
    # deterministic: same payload → same features
    feats2 = {r["media_id"]: r["features"] for r in M.extract_media_features(media_df).collect()}
    assert feats2["m1"] == by_id["m1"]["features"]
    assert feats2["m1"] != feats2["m2"]


def test_decode_stub_unknown_modality():
    with pytest.raises(NotImplementedError, match="no decoder"):
        M.decode_stub(b"bytes", "hologram")


def test_frame_sample_plan(spark, media_df):
    frames = M.frame_sample_plan(media_df, every_ms=1000).collect()
    # 3500ms video at 1000ms cadence → frames at 0,1000,2000
    assert [(r["frame_idx"], r["ts_ms"]) for r in sorted(frames, key=lambda r: r["frame_idx"])] == [
        (0, 0), (1, 1000), (2, 2000)
    ]
    assert all(r["media_id"] == "m4" for r in frames)


def test_media_stats_jvm_only(spark, media_df):
    stats = {r["modality"]: r["n"] for r in M.media_stats(media_df).collect()}
    assert stats == {"image": 2, "audio": 1, "video": 1}
