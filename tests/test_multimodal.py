"""Tests for the multimodal binary-column plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xesmf_spark import multimodal as MM


@pytest.fixture(scope="module")
def payloads(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = MM.attach_payload(docs.limit(50))
    p.persist().count()
    return p


def test_extract_features_matches_direct(spark, payloads):
    rows = {r.doc_id: r for r in MM.extract_features(payloads).collect()}
    src = {r.doc_id: bytes(r.payload) for r in payloads.collect()}
    assert set(rows) == set(src)
    for did, b in src.items():
        arr = np.frombuffer(b, dtype=np.uint8)
        r = rows[did]
        assert r.n_bytes == len(b)
        assert r.byte_sum == int(arr.sum())
        assert abs(r.mean_byte - float(arr.mean())) < 1e-12
        assert r.width == 16
        assert r.height == max(1, len(b) // 16)


def test_sample_frames_shape(spark, payloads):
    frames = MM.sample_frames(payloads, frame_bytes=64, stride=4)
    got = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("mx")
    )
    src = {r.doc_id: bytes(r.payload) for r in payloads.collect()}
    for r in got.collect():
        n_frames = max(1, len(src[r.doc_id]) // 64)
        expect = len(range(0, n_frames, 4))
        assert r.n == expect
    # frame content round-trips
    f0 = {r.doc_id: bytes(r.frame) for r in frames.filter("frame_idx = 0").collect()}
    for did, b in src.items():
        assert f0[did] == b[:64]


def test_decode_image_gated(spark):
    if not MM.HAVE_PIL:
        with pytest.raises(NotImplementedError):
            MM.decode_image(b"\x00" * 100)


def test_fake_decode_shapes():
    assert MM._fake_decode(b"x" * 160).shape == (10, 16)
    assert MM._fake_decode(b"x" * 7).shape == (1, 16)
    assert MM._fake_decode(b"x" * 170).shape == (10, 16)  # truncates remainder
