"""Multimodal plumbing: feature extraction, frame sampling, codec gate."""

import hashlib

import numpy as np
import pytest

from ferrobus_spark.operators.multimodal import (
    decode_metadata,
    extract_features,
    sample_frames,
)
from ferrobus_spark.sources.pages import pages_table


@pytest.fixture(scope="module")
def pages(spark, sf_dir):
    return pages_table(spark, sf_dir).limit(50).localCheckpoint()


def test_extract_features_matches_numpy(spark, pages):
    got = {r.doc_id: np.array(r.feature, np.float32)
           for r in extract_features(pages).collect()}
    src = {r.doc_id: bytes(r.html) for r in pages.select("doc_id", "html").collect()}
    assert set(got) == set(src)
    for did, b in src.items():
        h = hashlib.sha256(b).digest() * ((32 * 4) // 32 + 1)
        v = np.frombuffer(h[: 32 * 4], np.uint8).astype(np.float32)
        v = (v.reshape(32, 4).mean(axis=1) - 127.5) / 127.5
        assert got[did].shape == (32,)
        assert np.array_equal(got[did], v), did
        assert np.all(np.abs(got[did]) <= 1.0)


def test_sample_frames_shape_and_hashes(spark, pages):
    rows = sample_frames(pages).collect()
    src = {r.doc_id: bytes(r.html) for r in pages.select("doc_id", "html").collect()}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.frame_idx, r.frame_sha256))
    assert set(by_doc) == set(src)
    for did, b in src.items():
        chunks = [b[k: k + 256] for k in range(0, max(len(b), 1), 256)]
        exp = [
            (idx, hashlib.sha256(ch).hexdigest())
            for idx, ch in enumerate(chunks[::4][:8])
        ]
        assert sorted(by_doc[did]) == exp, did


def test_decode_requires_real_codecs_gate(spark, pages):
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        decode_metadata(pages, binary_col="html", require_real_codecs=True)


def test_resize_images_stride_sample(spark, pages):
    from ferrobus_spark.operators.multimodal import resize_images

    rows = {r.doc_id: r for r in resize_images(pages).collect()}
    src = {r.doc_id: bytes(r.html) for r in pages.select("doc_id", "html").collect()}
    assert set(rows) == set(src)
    for did, b in src.items():
        out = bytes(rows[did].resized)
        assert len(out) == 64 * 64
        idx = (np.arange(64 * 64, dtype=np.int64) * len(b)) // (64 * 64)
        assert out == np.frombuffer(b, np.uint8)[idx].tobytes(), did
        assert (rows[did].out_width, rows[did].out_height) == (64, 64)


def test_resize_requires_real_codecs_gate(spark, pages):
    from ferrobus_spark.operators.multimodal import resize_images

    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        resize_images(pages, require_real_codecs=True)
