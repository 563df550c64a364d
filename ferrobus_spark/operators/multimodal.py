"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schemas, Arrow batch shapes, UDF
signatures, partition sizing — is real and tested; the actual codec
calls are STUBBED deterministically because no image/audio libraries
exist in this container (clearly marked below). Swap ``_decode_stub``
for PIL/ffmpeg calls in production; nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("format", T.StringType()),
    T.StructField("content_sha256", T.StringType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_sha256", T.StringType()),
])

HAVE_CODECS = False  # no PIL/ffmpeg in this container


def _decode_stub(payload: bytes) -> tuple[int, int, int, str]:
    """STUB: deterministic fake decode (no image libs available).

    Production: ``PIL.Image.open(io.BytesIO(payload))``. Raise if a
    caller explicitly demands real decoding.
    """
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 3 if h[2] % 4 else 1
    fmt = ["jpeg", "png", "webp"][h[3] % 3]
    return width, height, channels, fmt


def decode_metadata(df: DataFrame, binary_col: str = "html", id_col: str = "doc_id",
                    require_real_codecs: bool = False) -> DataFrame:
    """binary column → typed metadata rows via Arrow-batched mapInPandas."""
    if require_real_codecs and not HAVE_CODECS:
        raise NotImplementedError(
            "real image decode requires PIL/ffmpeg — not present in this environment"
        )

    def kernel(batches):
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(payload) if payload is not None else b""
                w, hgt, c, fmt = _decode_stub(b)
                rows.append((int(i), w, hgt, c, fmt, hashlib.sha256(b).hexdigest()))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "channels", "format", "content_sha256"],
            )

    from ferrobus_spark.plans.partitioning import spread_for_kernel

    return spread_for_kernel(df.select(id_col, binary_col)).mapInPandas(kernel, IMAGE_META_SCHEMA)


def extract_features(df: DataFrame, binary_col: str = "html", id_col: str = "doc_id",
                     dim: int = 32) -> DataFrame:
    """binary → fixed-dim feature vector (STUB: bytes → hashed projection).

    Production swaps the projection for a real vision encoder; the
    Arrow batch contract (one vector per row, float32) is identical.
    """

    def kernel(batches):
        for pdf in batches:
            ids, feats = [], []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(payload) if payload is not None else b""
                h = hashlib.sha256(b).digest() * ((dim * 4) // 32 + 1)
                v = np.frombuffer(h[: dim * 4], np.uint8).astype(np.float32)
                v = (v.reshape(dim, 4).mean(axis=1) - 127.5) / 127.5
                ids.append(int(i))
                feats.append(v.tolist())
            yield pd.DataFrame({"doc_id": ids, "feature": feats})

    from ferrobus_spark.plans.partitioning import spread_for_kernel

    return spread_for_kernel(df.select(id_col, binary_col)).mapInPandas(kernel, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("resized", T.BinaryType()),
    T.StructField("out_width", T.IntegerType()),
    T.StructField("out_height", T.IntegerType()),
])


def resize_images(df: DataFrame, binary_col: str = "html", id_col: str = "doc_id",
                  width: int = 64, height: int = 64,
                  require_real_codecs: bool = False) -> DataFrame:
    """binary image column → resized binary at (width, height).

    STUB codec (clearly marked): production is
    ``PIL.Image.open(...).resize((w, h)).tobytes()``; here the
    "resample" is a deterministic stride-sample of the payload bytes to
    exactly ``width*height`` output bytes (wrapping when the payload is
    shorter), so the Spark contract — Arrow batch in, fixed-size binary
    out, one row per image — is real and the output is content-derived
    and reproducible.
    """
    if require_real_codecs and not HAVE_CODECS:
        raise NotImplementedError(
            "real image resize requires PIL/ffmpeg — not present in this environment"
        )
    out_n = width * height

    def kernel(batches):
        for pdf in batches:
            ids, blobs = [], []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(payload) if payload is not None else b"\x00"
                if not b:
                    b = b"\x00"
                idx = (np.arange(out_n, dtype=np.int64) * len(b)) // out_n
                blobs.append(np.frombuffer(b, np.uint8)[idx].tobytes())
                ids.append(int(i))
            yield pd.DataFrame({
                "doc_id": ids,
                "resized": blobs,
                "out_width": np.full(len(ids), width, np.int32),
                "out_height": np.full(len(ids), height, np.int32),
            })

    from ferrobus_spark.plans.partitioning import spread_for_kernel

    return spread_for_kernel(df.select(id_col, binary_col)).mapInPandas(kernel, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, binary_col: str = "html", id_col: str = "doc_id",
                  every_n: int = 4, max_frames: int = 8) -> DataFrame:
    """video binary → sampled frame rows (STUB framing: fixed-size chunks).

    Production: ffmpeg keyframe extraction; the row-explosion shape
    (one row per sampled frame, content-addressed) is what matters for
    partitioning downstream.
    """

    def kernel(batches):
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(payload) if payload is not None else b""
                chunks = [b[k : k + 256] for k in range(0, max(len(b), 1), 256)]
                for idx, ch in enumerate(chunks[:: every_n][:max_frames]):
                    rows.append((int(i), idx, hashlib.sha256(ch).hexdigest()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_sha256"])

    from ferrobus_spark.plans.partitioning import spread_for_kernel

    return spread_for_kernel(df.select(id_col, binary_col)).mapInPandas(kernel, FRAME_SCHEMA)
