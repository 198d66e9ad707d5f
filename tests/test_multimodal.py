"""Multimodal plumbing tests: binary payloads, Arrow batching, stub decode."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from mock_map_reduce_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="abc"), Row(doc_id=2, text=""), Row(doc_id=3, text="aaaa")]
    )
    return mm.attach_binary_payload(docs)


def test_payload_schema(media):
    schema = dict(media.dtypes)
    assert schema["payload"] == "binary"
    assert "media_type" in schema["meta"] and "n_bytes" in schema["meta"]


def test_byte_features_hand_computed(media):
    rows = {r.doc_id: r for r in mm.byte_features(media).collect()}
    # "abc" = bytes 97,98,99: mean 98, std sqrt(2/3), entropy log2(3)
    assert rows[1].n_bytes == 3
    assert rows[1].mean_byte == 98.0
    assert rows[1].std_byte == round(math.sqrt(2.0 / 3.0), 6)
    assert rows[1].entropy_proxy == round(math.log2(3), 6)
    # empty payload: zeros, no crash
    assert (rows[2].n_bytes, rows[2].mean_byte) == (0, 0.0)
    # uniform payload: zero std, zero entropy
    assert (rows[3].std_byte, rows[3].entropy_proxy) == (0.0, 0.0)


def test_decode_image_stub_raises():
    with pytest.raises(NotImplementedError, match="image library"):
        mm.decode_image(b"\x89PNG\r\n")


def test_frame_sample_one_to_many(spark):
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a" * 1000), Row(doc_id=2, text="xy")]
    )
    media = mm.attach_binary_payload(docs)
    frames = mm.frame_sample(media, frame_size=256, stride=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 1000 bytes -> 4 frames, stride 2 -> indices 0, 2
    assert sorted(r.frame_idx for r in by_doc[1]) == [0, 2]
    assert by_doc[1][0].frame_mean == 97.0  # all "a" bytes
    # doc 2: 2 bytes -> 1 frame
    assert [r.frame_idx for r in by_doc[2]] == [0]


def test_resize_payload(spark):
    from pyspark.sql import Row

    docs = spark.createDataFrame([Row(doc_id=1, text="abcdefgh"), Row(doc_id=2, text="")])
    media = mm.attach_binary_payload(docs)
    rows = {r.doc_id: r for r in mm.resize_payload(media, factor=4).collect()}
    assert bytes(rows[1].payload) == b"ae"  # every 4th byte
    assert rows[1].n_bytes == 2
    assert (bytes(rows[2].payload), rows[2].n_bytes) == (b"", 0)
