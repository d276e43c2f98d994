"""Reference-shaped CSV writer + column-order parity + kNN grid path."""

import csv
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from batch_geocode_ray.sources.writers import (
    reference_column_order,
    strip_index_prefix,
    write_reference_csv,
)


def test_reference_column_order():
    cols = ["url", "lang", "GM1_name", "GM1_lat", "GM1_long", "GM1_type",
            "GM1_buffer", "best_name", "best_type", "best_lat", "best_long",
            "best_buffer", "OSM1_name", "OSM1_type", "OSM1_lat", "OSM1_long",
            "OSM1_buffer"]
    order = reference_column_order(cols)
    assert order[:2] == ["url", "lang"]          # meta first, input order
    assert order[2:7] == ["best_name", "best_type", "best_lat",
                          "best_long", "best_buffer"]  # best forced first
    assert order[7].startswith("GM1")            # then case-insensitive sort


def test_reference_column_order_adds_missing():
    # a prefix missing some suffixes still gets all 5 slots (reindex)
    order = reference_column_order(["url", "GM1_name"])
    assert [c for c in order if c.startswith("GM1")] == [
        "GM1_name", "GM1_type", "GM1_lat", "GM1_long", "GM1_buffer"]


def test_strip_index_prefix():
    got = strip_index_prefix(pa.array(["3: Paris", "nochange", "7: X 1: Y"]))
    assert got.to_pylist() == ["Paris", "nochange", "X Y"]


def test_write_reference_csv(tmp_path):
    ds = rd.from_arrow(pa.table({
        "url": pa.array(["u1", "u2"]),
        "GM1_name": pa.array(["A", None]),
        "GM1_lat": pa.array([1.0, None]),
    }))
    out = str(tmp_path / "out.csv")
    n = write_reference_csv(ds, out)
    assert n == 2
    with open(out) as f:
        rows = list(csv.reader(f))
    header = rows[0]
    assert header[0] == "url"
    assert header[1:6] == ["best_name", "best_type", "best_lat",
                           "best_long", "best_buffer"]
    assert "GM1_type" in header  # null-materialized missing column
    assert rows[1][header.index("GM1_name")] == "A"


def test_write_reference_csv_row_guard(tmp_path):
    ds = rd.from_arrow(pa.table({"url": pa.array(["a"] * 10)}))
    with pytest.raises(ValueError):
        write_reference_csv(ds, str(tmp_path / "x.csv"), max_driver_rows=5)


def test_knn_grid_matches_bruteforce():
    from batch_geocode_ray.stages.knn import FacilityIndex, KNNFacilities

    rng = np.random.RandomState(9)
    fac = pa.table({
        "facility_id": pa.array(range(300), pa.int64()),
        "name": pa.array([f"f{i}" for i in range(300)]),
        "lat": pa.array(rng.uniform(-60, 60, 300)),
        "lon": pa.array(rng.uniform(-170, 170, 300)),
        "facility_type": pa.array(["c"] * 300),
    })
    idx = FacilityIndex(fac)
    batch = pa.table({
        "best_long": pa.array(rng.uniform(-170, 170, 50)),
        "best_lat": pa.array(rng.uniform(-60, 60, 50)),
    })
    brute = KNNFacilities(idx, k=3)(batch)
    grid = KNNFacilities(idx, k=3, use_grid=True)(batch)
    for a, b in zip(brute["knn_ids"].to_pylist(), grid["knn_ids"].to_pylist()):
        assert a == b


def test_knn_grid_exact_under_sparsity_and_high_latitude():
    # adversarial: few facilities, finer grid, high-|lat| query points —
    # the ring often holds >=k candidates that are NOT the true top-k,
    # exercising the guarantee-radius fallback
    from batch_geocode_ray.stages.knn import FacilityIndex, KNNFacilities

    rng = np.random.RandomState(17)
    nf = 40
    fac = pa.table({
        "facility_id": pa.array(range(nf), pa.int64()),
        "name": pa.array([f"f{i}" for i in range(nf)]),
        "lat": pa.array(rng.uniform(55, 75, nf)),
        "lon": pa.array(rng.uniform(-30, 30, nf)),
        "facility_type": pa.array(["c"] * nf),
    })
    idx = FacilityIndex(fac, grid_res=4)
    batch = pa.table({
        "best_long": pa.array(rng.uniform(-30, 30, 80)),
        "best_lat": pa.array(rng.uniform(55, 75, 80)),
    })
    brute = KNNFacilities(idx, k=5)(batch)
    grid = KNNFacilities(idx, k=5, use_grid=True)(batch)
    assert brute["knn_ids"].to_pylist() == grid["knn_ids"].to_pylist()
