"""Multimodal column plumbing: schemas, batch shapes, determinism, and
partition invariance of the binary-column operators."""

from __future__ import annotations

import pytest

from fastembed_rs_spark.operators.multimodal import (
    audio_features,
    probe_media,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, bytearray(b"\x89PNG\r\n" + b"x" * 100)),
        (1, bytearray(b"\xff\xd8\xff\xe0" + b"y" * 50)),
        (2, bytearray(b"RIFF" + b"z" * 400)),
        (3, bytearray(b"ID3\x04" + b"w" * 200)),
        (4, bytearray(b"\x00\x00\x00\x18ftyp" + b"v" * 300)),
        (5, bytearray(b"garbage-bytes")),
    ]
    return spark.createDataFrame(rows, ["media_id", "content"])


def test_probe_media_kinds(spark, media):
    rows = {r["media_id"]: r["media_meta"] for r in probe_media(media).collect()}
    assert rows[0]["kind"] == "image" and rows[0]["format"] == "png"
    assert rows[1]["kind"] == "image" and rows[1]["format"] == "jpeg"
    assert rows[2]["kind"] == "audio" and rows[2]["format"] == "wav"
    assert rows[3]["kind"] == "audio" and rows[3]["format"] == "mp3"
    assert rows[4]["kind"] == "video" and rows[4]["format"] == "mp4"
    assert rows[5]["kind"] == "unknown"
    assert rows[0]["n_bytes"] == 106
    assert rows[0]["width"] is not None and rows[2]["width"] is None
    assert rows[2]["sample_rate"] == 16000


def test_sample_frames_shape_and_determinism(spark, media):
    vids = media.filter("media_id = 4")
    rows = sample_frames(vids, n_frames=3, frame_size=4).collect()
    assert len(rows) == 1
    frames = rows[0]["frames"]
    assert [f["frame_idx"] for f in frames] == [0, 1, 2]
    assert all(len(f["pixels"]) == 4 * 4 * 3 for f in frames)
    again = sample_frames(vids, n_frames=3, frame_size=4).collect()
    assert [bytes(f["pixels"]) for f in frames] == [
        bytes(f["pixels"]) for f in again[0]["frames"]
    ]


def test_audio_features_vector(spark, media):
    rows = audio_features(media, n_mels=8).collect()
    assert all(len(r["audio_features"]) == 8 for r in rows)
    for r in rows:
        assert all(0.0 <= v <= 1.5 for v in r["audio_features"])


def test_partition_invariance(spark, media):
    a = {r["media_id"]: r["media_meta"] for r in probe_media(media.repartition(1)).collect()}
    b = {r["media_id"]: r["media_meta"] for r in probe_media(media.repartition(5)).collect()}
    assert a == b
