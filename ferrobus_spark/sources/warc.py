"""WARC source/sink — the Common-Crawl container format, stdlib-only.

The pages table's production shape is a crawl of WARC files (the
input_hint's ``(url, warc_ts, html, ...)`` columns come from WARC
response records). This module round-trips that shape:

* :func:`write_warc` — pages → ``part-*.warc`` files, one file per Spark
  partition, written executor-side (``mapInPandas`` sink — no driver
  collect). Records follow the WARC/1.0 layout (ISO 28500): header
  block, ``Content-Length``-delimited payload, CRLF CRLF terminator.
* :func:`read_warc` — ``*.warc`` glob → (url, warc_ts, html) DataFrame.
  Parallelism is per FILE (Common Crawl ships ~64k ~1 GB files per
  crawl — file granularity IS the cluster-scale unit); each task
  streams one file, splitting records on the Content-Length framing,
  never materializing more than one record batch.

Round-trip is byte-exact on the html payload and lossless on url +
warc_ts (second precision, as WARC-Date carries); verified in
tests/test_warc.py against the pages table.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"


def _record(url: str, ts_iso: str, payload: bytes) -> bytes:
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + ts_iso.encode() + _CRLF
        + b"Content-Type: text/html" + _CRLF
        + b"Content-Length: " + str(len(payload)).encode() + _CRLF
        + _CRLF
    )
    return head + payload + _CRLF + _CRLF


def write_warc(pages: DataFrame, out_dir: str) -> int:
    """Write (url, warc_ts, html) rows as part-<partition>.warc files.

    Returns the number of records written. Executor-side file writes —
    on a cluster ``out_dir`` must be shared storage.
    """
    os.makedirs(out_dir, exist_ok=True)
    src = pages.select(
        "url",
        F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts_iso"),
        "html",
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import uuid

        n = 0
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.warc")
        buf = []
        for pdf in batches:
            for url, ts, html in zip(pdf["url"], pdf["ts_iso"], pdf["html"]):
                buf.append(_record(url, ts, bytes(html)))
                n += 1
        if buf:
            with open(path, "wb") as f:
                f.write(b"".join(buf))
        yield pd.DataFrame({"n": [n]})

    counts = src.mapInPandas(kernel, "n long").collect()
    return int(sum(r.n for r in counts))


_READ_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
])


def _parse_file(path: str) -> pd.DataFrame:
    urls, tss, payloads = [], [], []
    with open(path, "rb") as f:
        data = f.read()
    i, n = 0, len(data)
    while i < n:
        end_head = data.find(_CRLF + _CRLF, i)
        if end_head < 0:
            break
        headers = {}
        for line in data[i:end_head].split(_CRLF):
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
        length = int(headers.get(b"content-length", b"0"))
        payload = data[end_head + 4 : end_head + 4 + length]
        urls.append(headers.get(b"warc-target-uri", b"").decode())
        tss.append(
            pd.Timestamp(headers.get(b"warc-date", b"1970-01-01T00:00:00Z").decode())
            .tz_convert(None)
            if b"warc-date" in headers
            else pd.NaT
        )
        payloads.append(payload)
        i = end_head + 4 + length + 4  # payload + CRLF CRLF
    return pd.DataFrame({"url": urls, "warc_ts": tss, "html": payloads})


def read_warc(spark: SparkSession, warc_dir: str) -> DataFrame:
    """``*.warc`` files → (url, warc_ts, html), one task per file."""
    files = sorted(
        os.path.join(warc_dir, f)
        for f in os.listdir(warc_dir)
        if f.endswith(".warc")
    )
    if not files:
        return spark.createDataFrame([], _READ_SCHEMA)
    files_df = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(min(len(files), spark.sparkContext.defaultParallelism))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                out = _parse_file(p)
                if len(out):
                    yield out

    return files_df.mapInPandas(kernel, _READ_SCHEMA)
