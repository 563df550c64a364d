"""Unit tests for the transit-model parquet cache (model/cache.py)."""

import os

from pyspark.sql import functions as F


def test_cache_key_is_stable_and_content_derived():
    from ferrobus_spark.model.cache import model_cache_key

    k1 = model_cache_key()
    k2 = model_cache_key()
    assert k1 == k2
    assert len(k1) == 16 and all(c in "0123456789abcdef" for c in k1)


def test_cache_roundtrip_and_reuse(spark, tmp_path):
    """Second load must hit the parquet cache (marker present, no
    rebuild) and hand back the same table contents."""
    from ferrobus_spark.model.cache import (
        _MARKER,
        load_or_build_model,
        load_or_build_points,
        model_cache_key,
    )

    root = str(tmp_path / "mc")
    m1 = load_or_build_model(spark, cache_root=root)
    cdir = os.path.join(root, model_cache_key())
    assert os.path.exists(os.path.join(cdir, _MARKER))
    # mutate nothing; second load reads the same parquet back
    m2 = load_or_build_model(spark, cache_root=root)
    for name in ("stops_dim", "transfers", "stop_times"):
        a = sorted(map(tuple, m1[name].collect()))
        b = sorted(map(tuple, m2[name].collect()))
        assert a == b, name
    # CSR kernels agree (rebuilt from the cached street tables)
    assert m1.csr.node_ids.tolist() == m2.csr.node_ids.tolist()

    p1 = load_or_build_points(spark, m1, cache_root=root)
    assert os.path.exists(os.path.join(cdir, "points", _MARKER))
    p2 = load_or_build_points(spark, m2, cache_root=root)
    assert set(p1) == set(p2)
    for name in p1:
        a = sorted(map(tuple, p1[name].collect()))
        b = sorted(map(tuple, p2[name].collect()))
        assert a == b, name


def test_cache_half_written_dir_is_rebuilt(spark, tmp_path):
    """A cache dir without the marker (builder killed mid-write) must be
    discarded and rebuilt, not trusted."""
    from ferrobus_spark.model.cache import (
        _MARKER,
        load_or_build_model,
        model_cache_key,
    )

    root = str(tmp_path / "mc2")
    cdir = os.path.join(root, model_cache_key())
    os.makedirs(os.path.join(cdir, "stops_dim"))
    with open(os.path.join(cdir, "stops_dim", "part-0.parquet"), "w") as f:
        f.write("GARBAGE")
    m = load_or_build_model(spark, cache_root=root)
    assert os.path.exists(os.path.join(cdir, _MARKER))
    assert m["stops_dim"].filter(F.col("stop_idx").isNotNull()).count() > 0
