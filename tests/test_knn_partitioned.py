"""Partitioned halo-join kNN vs the broadcast exact path."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from batch_geocode_ray.stages.knn import (
    FacilityIndex,
    KNNFacilities,
    knn_partitioned,
)


def test_partitioned_knn_matches_broadcast_where_exact():
    rng = np.random.RandomState(21)
    nf, npts = 3000, 300
    fac_t = pa.table({
        "facility_id": pa.array(range(nf), pa.int64()),
        "name": pa.array([f"f{i}" for i in range(nf)]),
        "lat": pa.array(rng.uniform(-50, 50, nf)),
        "lon": pa.array(rng.uniform(-160, 160, nf)),
        "facility_type": pa.array(["c"] * nf),
    })
    pts_t = pa.table({
        "url": pa.array([f"u{i}" for i in range(npts)]),
        "best_long": pa.array(rng.uniform(-160, 160, npts)),
        "best_lat": pa.array(rng.uniform(-50, 50, npts)),
    })
    got = {r["url"]: r for r in knn_partitioned(
        rd.from_arrow(pts_t).repartition(3),
        rd.from_arrow(fac_t).repartition(2),
        k=3, grid_res=0, id_col="url").take_all()}
    assert len(got) == npts

    brute = KNNFacilities(FacilityIndex(fac_t), k=3)(pts_t)
    want = {u: ids for u, ids in zip(pts_t["url"].to_pylist(),
                                     brute["knn_ids"].to_pylist())}
    n_exact = 0
    for u, r in got.items():
        if r["knn_exact"]:
            n_exact += 1
            assert list(r["knn_ids"]) == want[u], u
        # even inexact rows return their ring-local best-effort top-k
        assert len(r["knn_ids"]) <= 3
    # the guarantee must hold for a solid majority at this density
    assert n_exact > npts * 0.5


def test_partitioned_knn_null_coords_dropped():
    fac_t = pa.table({
        "facility_id": pa.array([0], pa.int64()),
        "name": pa.array(["f"]),
        "lat": pa.array([0.0]),
        "lon": pa.array([0.0]),
        "facility_type": pa.array(["c"]),
    })
    pts_t = pa.table({
        "url": pa.array(["a", "b"]),
        "best_long": pa.array([0.5, None], pa.float64()),
        "best_lat": pa.array([0.5, None], pa.float64()),
    })
    out = knn_partitioned(rd.from_arrow(pts_t), rd.from_arrow(fac_t),
                          k=1, grid_res=2, id_col="url").take_all()
    assert [r["url"] for r in out] == ["a"]
    assert out[0]["knn_ids"] == [0]
