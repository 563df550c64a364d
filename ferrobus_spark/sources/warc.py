"""WARC source/sink — the Common-Crawl container format, stdlib-only.

The pages table's production shape is a crawl of WARC files (the
input_hint's ``(url, warc_ts, html, ...)`` columns come from WARC
response records). This module round-trips that shape:

* :func:`write_warc` — pages → ``part-*.warc[.gz]`` files, one file per
  Spark partition, written executor-side (``mapInPandas`` sink — no
  driver collect). Records follow the WARC/1.0 layout (ISO 28500):
  header block (with a deterministic ``WARC-Record-ID``),
  ``Content-Length``-delimited payload, CRLF CRLF terminator.
  ``compress=True`` writes one gzip member PER RECORD, concatenated —
  the actual Common Crawl ``.warc.gz`` layout (readers can seek to a
  record and decompress just its member).
* :func:`read_warc` — ``*.warc`` / ``*.warc.gz`` glob → (url, warc_ts,
  html) DataFrame. Parallelism is per FILE (Common Crawl ships ~64k
  ~1 GB files per crawl — file granularity IS the cluster-scale unit);
  each task STREAMS one file record-by-record on the Content-Length
  framing (never materializing the file, emitting bounded batches).
  Python's gzip module reads concatenated members transparently, so the
  same frame reader serves both layouts.

``WARC-Date`` is rendered in true UTC regardless of
``spark.sql.session.timeZone`` (the ``Z`` suffix is honest), and the
read side converts back into the session zone, so external consumers
and the round-trip both see correct instants. Round-trip is byte-exact
on the html payload and lossless on url + warc_ts (second precision,
as WARC-Date carries); verified in tests/test_warc.py.
"""

from __future__ import annotations

import gzip
import os
import uuid
from typing import IO, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"
_READ_BATCH = 1024  # records per emitted pandas batch (memory bound)


def _record_id(url: str, ts_iso: str) -> str:
    """Deterministic urn:uuid (RFC 9309 allows any globally unique URI)."""
    return f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, url + '|' + ts_iso)}>"


def _record(url: str, ts_iso: str, payload: bytes) -> bytes:
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Record-ID: " + _record_id(url, ts_iso).encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + ts_iso.encode() + _CRLF
        + b"Content-Type: text/html" + _CRLF
        + b"Content-Length: " + str(len(payload)).encode() + _CRLF
        + _CRLF
    )
    return head + payload + _CRLF + _CRLF


def write_warc(pages: DataFrame, out_dir: str, compress: bool = False) -> int:
    """Write (url, warc_ts, html) rows as part-<uuid>.warc[.gz] files.

    Returns the number of records written. Executor-side file writes —
    on a cluster ``out_dir`` must be shared storage. ``compress=True``
    emits one gzip member per record (Common Crawl ``.warc.gz`` shape).
    """
    os.makedirs(out_dir, exist_ok=True)
    spark = pages.sparkSession
    tz = spark.conf.get("spark.sql.session.timeZone")
    src = pages.select(
        "url",
        # render the instant's UTC wall time whatever the session tz is
        F.date_format(
            F.to_utc_timestamp(F.col("warc_ts"), tz), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("ts_iso"),
        "html",
    )
    ext = ".warc.gz" if compress else ".warc"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}{ext}")
        f: IO[bytes] | None = None
        for pdf in batches:
            for url, ts, html in zip(pdf["url"], pdf["ts_iso"], pdf["html"]):
                if f is None:
                    f = open(path, "wb")
                rec = _record(url, ts, bytes(html))
                f.write(gzip.compress(rec) if compress else rec)
                n += 1
        if f is not None:
            f.close()
        yield pd.DataFrame({"n": [n]})

    counts = src.mapInPandas(kernel, "n long").collect()
    return int(sum(r.n for r in counts))


_READ_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
])


def _iter_records(f: IO[bytes]) -> Iterator[tuple[dict[bytes, bytes], bytes]]:
    """Stream (headers, payload) frames: header lines until the blank
    line, then exactly Content-Length payload bytes, then the CRLF CRLF
    record terminator. Never holds more than one record in memory."""
    while True:
        line = f.readline()
        if not line:
            return
        if line in (_CRLF, b"\n"):
            continue  # inter-record padding
        if not line.startswith(b"WARC/"):
            continue  # tolerate junk between records
        headers: dict[bytes, bytes] = {}
        while True:
            hl = f.readline()
            if not hl or hl in (_CRLF, b"\n"):
                break
            if b":" in hl:
                k, v = hl.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
        length = int(headers.get(b"content-length", b"0"))
        payload = f.read(length) if length else b""
        yield headers, payload


def _parse_file(path: str, tz: str) -> Iterator[pd.DataFrame]:
    """One file → bounded-size (url, warc_ts, html) batches."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        urls: list[str] = []
        tss: list = []
        payloads: list[bytes] = []
        for headers, payload in _iter_records(f):
            urls.append(headers.get(b"warc-target-uri", b"").decode())
            if b"warc-date" in headers:
                ts = pd.Timestamp(headers[b"warc-date"].decode())
                # UTC instant → session-zone wall time (Spark reads naive
                # pandas timestamps as session-zone)
                tss.append(ts.tz_convert(tz).tz_localize(None))
            else:
                tss.append(pd.NaT)
            payloads.append(payload)
            if len(urls) >= _READ_BATCH:
                yield pd.DataFrame({"url": urls, "warc_ts": tss, "html": payloads})
                urls, tss, payloads = [], [], []
        if urls:
            yield pd.DataFrame({"url": urls, "warc_ts": tss, "html": payloads})


def read_warc(spark: SparkSession, warc_dir: str) -> DataFrame:
    """``*.warc[.gz]`` files → (url, warc_ts, html), one task per file."""
    files = sorted(
        os.path.join(warc_dir, f)
        for f in os.listdir(warc_dir)
        if f.endswith((".warc", ".warc.gz"))
    )
    if not files:
        return spark.createDataFrame([], _READ_SCHEMA)
    tz = spark.conf.get("spark.sql.session.timeZone")
    files_df = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(min(len(files), spark.sparkContext.defaultParallelism))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                yield from _parse_file(p, tz)

    return files_df.mapInPandas(kernel, _READ_SCHEMA)
