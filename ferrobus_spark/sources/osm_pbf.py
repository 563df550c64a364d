"""OSM PBF street-network scan — pure-stdlib decode, blob-parallel in Spark.

Reference parity: the reference loads streets via its osm4routing fork
(loading/osm/processor.rs:52-99): read nodes + ways from .osm.pbf, keep ways
with a ``highway`` tag, split each way into edges at *vertex* nodes (way
endpoints + nodes shared by ≥2 ways), per-edge length = haversine sum over
the intermediate geometry, foot accessibility classified from tags.

File format (public spec, wiki.openstreetmap.org/wiki/PBF_Format):
``[4B BE len][BlobHeader pb][Blob pb]`` repeated; Blob payload is a
zlib-compressed ``PrimitiveBlock`` holding a string table + groups of
DenseNodes / Ways with delta-packed varint ids and coords.

Scale design: the blob is the parallelism unit. The driver scans ONLY the
34-byte headers (seek-skipping payloads) to build a (offset, size) blob
index, then Spark fans blob decoding out via ``mapInPandas`` — each task
opens the file (shared storage on a cluster), seeks to its blobs, decodes
with zlib + NumPy-assisted varint parsing. A planet-scale PBF (~80 GB,
~60k blobs) therefore decodes with full cluster parallelism; nothing but
the header index ever sits on the driver. Downstream way-splitting /
length-summing is pure DataFrame algebra (see ``street_tables_from_pbf``).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# low-level protobuf wire decoding (stdlib only)
# ---------------------------------------------------------------------------


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_no, wire_type, value) over a protobuf message body."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            v, i = _varint(buf, i)
        elif wt == 2:  # length-delimited
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:  # fixed32
            v = buf[i : i + 4]
            i += 4
        elif wt == 1:  # fixed64
            v = buf[i : i + 8]
            i += 8
        else:  # pragma: no cover - groups unused in PBF
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


def _packed_varints(buf: bytes) -> list[int]:
    out = []
    i, n = 0, len(buf)
    while i < n:
        v, i = _varint(buf, i)
        out.append(v)
    return out


def _packed_sint_delta(buf: bytes) -> np.ndarray:
    vals = np.array([_zigzag(v) for v in _packed_varints(buf)], dtype=np.int64)
    return np.cumsum(vals)


# ---------------------------------------------------------------------------
# blob index (driver side — headers only, payloads seek-skipped)
# ---------------------------------------------------------------------------


def blob_index(path: str) -> list[tuple[str, int, int]]:
    """[(blob_type, payload_offset, payload_size)] without reading payloads."""
    out = []
    with open(path, "rb") as f:
        while True:
            hdr_len_raw = f.read(4)
            if len(hdr_len_raw) < 4:
                break
            (hdr_len,) = struct.unpack(">I", hdr_len_raw)
            hdr = f.read(hdr_len)
            btype, datasize = "", 0
            for field, _wt, v in _fields(hdr):
                if field == 1:
                    btype = v.decode()
                elif field == 3:
                    datasize = v
            offset = f.tell()
            out.append((btype, offset, datasize))
            f.seek(datasize, 1)
    return out


def _blob_payload(path: str, offset: int, size: int) -> bytes:
    with open(path, "rb") as f:
        f.seek(offset)
        blob = f.read(size)
    raw = zdata = None
    raw_size = 0
    for field, _wt, v in _fields(blob):
        if field == 1:
            raw = v
        elif field == 2:
            raw_size = v
        elif field == 3:
            zdata = v
    if raw is not None:
        return raw
    data = zlib.decompress(zdata)
    if raw_size and len(data) != raw_size:  # pragma: no cover
        raise ValueError("blob size mismatch")
    return data


# ---------------------------------------------------------------------------
# PrimitiveBlock decode → node / way record batches
# ---------------------------------------------------------------------------


def _decode_block(data: bytes) -> tuple[pd.DataFrame, pd.DataFrame]:
    """One PrimitiveBlock → (nodes_pdf(node_id,lon,lat), ways_pdf(way_id,refs,tags))."""
    stringtable: list[str] = []
    groups = []
    granularity, lat_off, lon_off = 100, 0, 0
    for field, _wt, v in _fields(data):
        if field == 1:  # stringtable
            stringtable = [
                s.decode("utf-8", "replace")
                for f2, _w2, s in _fields(v)
                if f2 == 1
            ]
        elif field == 2:
            groups.append(v)
        elif field == 17:
            granularity = v
        elif field == 19:
            lat_off = v
        elif field == 20:
            lon_off = v

    node_ids: list[np.ndarray] = []
    node_lats: list[np.ndarray] = []
    node_lons: list[np.ndarray] = []
    way_rows: list[tuple[int, list[int], dict[str, str]]] = []

    for g in groups:
        for field, _wt, v in _fields(g):
            if field == 2:  # DenseNodes
                ids = lats = lons = None
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        ids = _packed_sint_delta(v2)
                    elif f2 == 8:
                        lats = _packed_sint_delta(v2)
                    elif f2 == 9:
                        lons = _packed_sint_delta(v2)
                if ids is not None:
                    node_ids.append(ids)
                    node_lats.append(1e-9 * (lat_off + granularity * lats))
                    node_lons.append(1e-9 * (lon_off + granularity * lons))
            elif field == 3:  # Way
                wid = 0
                keys: list[int] = []
                vals: list[int] = []
                refs: np.ndarray | None = None
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        refs = _packed_sint_delta(v2)
                if refs is not None and len(refs) >= 2:
                    tags = {
                        stringtable[k]: stringtable[val]
                        for k, val in zip(keys, vals)
                    }
                    way_rows.append((wid, [int(r) for r in refs], tags))
            elif field == 1:  # plain (non-dense) Nodes — rare in practice
                nid, lat_r, lon_r = 0, 0, 0
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        nid = v2
                    elif f2 == 8:
                        lat_r = _zigzag(v2) if _w2 == 0 else 0
                    elif f2 == 9:
                        lon_r = _zigzag(v2) if _w2 == 0 else 0
                node_ids.append(np.array([nid], dtype=np.int64))
                node_lats.append(np.array([1e-9 * (lat_off + granularity * lat_r)]))
                node_lons.append(np.array([1e-9 * (lon_off + granularity * lon_r)]))

    nodes_pdf = pd.DataFrame(
        {
            "node_id": np.concatenate(node_ids) if node_ids else np.array([], dtype=np.int64),
            "lon": np.concatenate(node_lons) if node_lons else np.array([], dtype=np.float64),
            "lat": np.concatenate(node_lats) if node_lats else np.array([], dtype=np.float64),
        }
    )
    ways_pdf = pd.DataFrame(
        way_rows, columns=["way_id", "refs", "tags"]
    ) if way_rows else pd.DataFrame({"way_id": pd.Series(dtype="int64"),
                                     "refs": pd.Series(dtype=object),
                                     "tags": pd.Series(dtype=object)})
    return nodes_pdf, ways_pdf


# ---------------------------------------------------------------------------
# foot accessibility (osm4routing FootAccessibility semantics)
# ---------------------------------------------------------------------------

# highway values osm4routing marks foot=Forbidden; everything else with a
# highway tag is Allowed or Unknown — and the reference keeps both
# (processor.rs:63-70), so only the Forbidden set changes the graph.
_FOOT_FORBIDDEN_HIGHWAY = {
    "motorway", "motorway_link", "trunk", "trunk_link",
    "cycleway",  # dedicated cycleway: foot stays unknown unless tagged
}
_FOOT_ALLOWED_HIGHWAY = {
    "footway", "path", "steps", "pedestrian", "living_street", "track",
}
_FOOT_NO_VALUES = {"no", "use_sidepath"}


def foot_access(tags: dict[str, str]) -> str:
    """'allowed' | 'forbidden' | 'unknown' per osm4routing's foot rules."""
    hw = tags.get("highway", "")
    foot = tags.get("foot", "")
    if foot:
        return "forbidden" if foot in _FOOT_NO_VALUES else "allowed"
    if hw in _FOOT_ALLOWED_HIGHWAY:
        return "allowed"
    if hw in _FOOT_FORBIDDEN_HIGHWAY:
        return "forbidden"
    return "unknown"


def _is_routable(tags: dict[str, str]) -> bool:
    # osm4routing keeps ways carrying a highway tag
    return bool(tags.get("highway"))


# ---------------------------------------------------------------------------
# Spark scan
# ---------------------------------------------------------------------------

_NODES_SCHEMA = "node_id long, lon double, lat double"
_WAYS_SCHEMA = "way_id long, refs array<long>, foot string"


def read_osm_pbf(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """→ (nodes(node_id, lon, lat), ways(way_id, refs, foot)), blob-parallel.

    Only routable (highway-tagged) ways survive; tags are collapsed to the
    foot classification — the single property downstream consumes.
    """
    blobs = [(o, s) for t, o, s in blob_index(path) if t == "OSMData"]
    blob_df = spark.createDataFrame(blobs, "offset long, size long").repartition(
        max(1, min(len(blobs), spark.sparkContext.defaultParallelism))
    )

    def decode_nodes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for off, size in zip(b["offset"], b["size"]):
                nodes, _ways = _decode_block(_blob_payload(path, int(off), int(size)))
                if len(nodes):
                    yield nodes

    def decode_ways(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for off, size in zip(b["offset"], b["size"]):
                _nodes, ways = _decode_block(_blob_payload(path, int(off), int(size)))
                if len(ways):
                    ways = ways[ways["tags"].map(_is_routable)]
                if len(ways):
                    yield pd.DataFrame(
                        {
                            "way_id": ways["way_id"].astype("int64"),
                            "refs": ways["refs"],
                            "foot": ways["tags"].map(foot_access),
                        }
                    )

    nodes_df = blob_df.mapInPandas(decode_nodes, _NODES_SCHEMA)
    ways_df = blob_df.mapInPandas(decode_ways, _WAYS_SCHEMA)
    return nodes_df, ways_df


def street_tables_from_pbf(
    spark: SparkSession, path: str, materialize: bool = True
) -> dict[str, DataFrame]:
    """PBF → {street_nodes(node_id,lon,lat), street_edges(src,dst,length_m,foot)}.

    osm4routing edge semantics, as DataFrame algebra:

    1. explode way refs with position;
    2. a node is a VERTEX if it's a way endpoint or referenced by ≥2 ways
       (osm4routing's nodes_used counting);
    3. segment id = running count of vertices seen along the way (window);
       consecutive vertices bound one edge, interior nodes are geometry;
    4. edge length = sum of haversine over consecutive ref pairs
       (geo::Haversine, mean radius 6 371 008.8 — functions/geo.py).

    Everything shuffles on node_id / (way_id, seg) — no driver state.
    """
    from pyspark.sql import Window

    from ferrobus_spark.functions.geo import haversine_col

    nodes_df, ways_df = read_osm_pbf(spark, path)
    nodes_df = nodes_df.cache()

    refs = ways_df.select(
        "way_id", "foot", F.posexplode("refs").alias("pos", "node_id")
    )
    last_pos = refs.groupBy("way_id").agg(F.max("pos").alias("last_pos"))
    refs = refs.join(F.broadcast(last_pos), "way_id")

    # osm4routing's count_nodes_uses: endpoints contribute 2, interior refs 1;
    # a node is a VERTEX (edge split point) when total uses >= 2. This makes
    # every way endpoint a vertex and splits at shared or repeated nodes.
    use_count = refs.groupBy("node_id").agg(
        F.sum(
            F.when((F.col("pos") == 0) | (F.col("pos") == F.col("last_pos")), 2).otherwise(1)
        ).alias("n_uses")
    )
    refs = refs.join(use_count, "node_id").withColumn(
        "is_vertex", F.col("n_uses") >= 2
    )

    # segment id for a row = index of the last vertex at pos <= current, so a
    # vertex STARTS segment seg and interior nodes inherit it; every vertex
    # past pos 0 also TERMINATES the previous segment, so it's duplicated
    # there. The final vertex's own 1-point "segment" dies on n_pts >= 2.
    w = Window.partitionBy("way_id").orderBy("pos")
    refs = refs.withColumn(
        "seg", F.sum(F.col("is_vertex").cast("int")).over(w) - 1
    )
    seg_rows = refs.select("way_id", "foot", "pos", "node_id", "seg").union(
        refs.filter(F.col("is_vertex") & (F.col("pos") > 0))
        .select("way_id", "foot", "pos", "node_id", (F.col("seg") - 1).alias("seg"))
    )

    seg_rows = seg_rows.join(
        nodes_df.withColumnRenamed("node_id", "nid"),
        F.col("node_id") == F.col("nid"),
    ).drop("nid")

    w2 = Window.partitionBy("way_id", "seg").orderBy("pos")
    with_next = seg_rows.select(
        "way_id", "seg", "foot", "pos", "node_id", "lon", "lat",
        F.lead("node_id").over(w2).alias("nxt_id"),
        F.lead("lon").over(w2).alias("nxt_lon"),
        F.lead("lat").over(w2).alias("nxt_lat"),
    )
    edges = (
        with_next.withColumn(
            "step_m",
            F.when(
                F.col("nxt_id").isNotNull(),
                haversine_col(F.col("lon"), F.col("lat"), F.col("nxt_lon"), F.col("nxt_lat")),
            ).otherwise(F.lit(0.0)),
        )
        .groupBy("way_id", "seg", "foot")
        .agg(
            F.sum("step_m").alias("length_m"),
            F.min_by("node_id", "pos").alias("src"),
            F.max_by("node_id", "pos").alias("dst"),
            F.count("*").alias("n_pts"),
        )
        .filter(F.col("n_pts") >= 2)
    )
    # Foot filter FIRST (the reference drops foot-forbidden ways at read
    # time, processor.rs:63-70), so a forbidden parallel way can't shadow an
    # allowed one in the collapse below.
    edges = edges.filter(F.col("foot").isin("allowed", "unknown"))
    # Parallel-edge collapse, replicating the reference's component rebuild
    # (osm/processor.rs:29-46): petgraph's find_edge returns the NEWEST edge
    # between a node pair (edges prepend to the adjacency list), so parallel
    # ways between the same two vertices collapse to the LAST-read edge's
    # weight. Keep max (way_id, seg) per unordered pair.
    edges = (
        edges.withColumn("lo", F.least("src", "dst"))
        .withColumn("hi", F.greatest("src", "dst"))
        .withColumn("ord", F.struct("way_id", "seg"))
        .groupBy("lo", "hi")
        .agg(
            F.max_by(F.struct("src", "dst", "length_m", "foot"), F.col("ord")).alias("e")
        )
        .select("e.src", "e.dst", "e.length_m", "e.foot")
    )

    street_nodes = (
        refs.filter("is_vertex")
        .select("node_id")
        .distinct()
        .join(nodes_df, "node_id")
        .select("node_id", "lon", "lat")
    )
    out = {"street_nodes": street_nodes, "street_edges": edges}
    if materialize:
        # downstream (component detection, CSR collect, snapping) reads
        # these repeatedly; one materialization beats re-running the
        # decode + window plan per consumer
        out = {k: v.localCheckpoint() for k, v in out.items()}
    return out
