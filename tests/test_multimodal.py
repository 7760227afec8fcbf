"""Multimodal plumbing tests: binary payload column + mapInPandas
decode/feature/frame-sample (stub codec — SURVEY north-star)."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from i3cols_spark.functions.multimodal import (
    attach_fake_media,
    extract_features,
    frame_sample,
)
from i3cols_spark.sources.tables import table


def test_extract_features_shapes_and_determinism(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(50)
    media = attach_fake_media(docs)
    feats = extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 50
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for mid, r in rows.items():
        payload = src[mid].encode()
        assert r["n_bytes"] == len(payload)
        assert r["checksum"] == hashlib.md5(payload).hexdigest()
        expected = [float(b) for b in payload[::8][:32]]
        assert r["features"] == pytest.approx(expected)


def test_unknown_media_type_raises_cleanly(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(1)
    media = attach_fake_media(docs).withColumn("media_type", F.lit("video/mp4"))
    with pytest.raises(Exception, match="NotImplementedError|unknown media_type"):
        extract_features(media).collect()


def test_frame_sample_reduces_payload(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(10)
    media = attach_fake_media(docs)
    sampled = frame_sample(media, every_n=4)
    joined = (
        media.select("media_id", F.octet_length("payload").alias("n0"))
        .join(
            sampled.select("media_id", F.octet_length("payload").alias("n1")),
            "media_id",
        )
        .collect()
    )
    for r in joined:
        assert r["n1"] <= r["n0"] // 4 + 8


def test_resize_halves_payload_and_metadata(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(10)
    media = attach_fake_media(docs).withColumn("width", F.lit(640)).withColumn(
        "height", F.lit(480)
    )
    from i3cols_spark.functions.multimodal import resize_media

    resized = resize_media(media, factor=2)
    rows = (
        media.select("media_id", F.octet_length("payload").alias("n0"))
        .join(
            resized.select(
                "media_id",
                F.octet_length("payload").alias("n1"),
                "width",
                "height",
            ),
            "media_id",
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert r["n1"] == (r["n0"] + 1) // 2
        assert r["width"] == 320 and r["height"] == 240


def test_video_with_zero_frames_raises_value_error(spark):
    """An AVI whose movi list holds no frames must produce a clear
    per-payload ValueError, not a NaN mean_luma (ADVICE r05)."""
    import struct

    from i3cols_spark.functions.multimodal import extract_video_features

    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<14I", 0, 0, 0, 0, 0, 0, 0, 0, 16, 16, 0, 0, 0, 0
    )
    strh = (
        b"strh" + struct.pack("<I", 28)
        + b"vids" + b"MJPG" + b"\x00" * 12 + struct.pack("<II", 1, 10)
    )
    body = b"AVI " + avih + strh
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    df = spark.createDataFrame([(1, bytearray(payload))], "media_id long, payload binary")
    with pytest.raises(Exception, match="no frames"):
        extract_video_features(df).collect()
