"""grouped_quantile_cont (stages/aggregates.py): numpy-oracle parity
(np.percentile 'linear' IS the percentile_cont h=(n-1)q semantics),
hand-computed interpolation, null handling, and validation errors."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from batch_geocode_ray.stages.aggregates import grouped_quantile_cont


def _collect(out):
    t = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")])
    return t.sort_by([("g", "ascending")])


def test_matches_numpy_percentile(ray_session):
    rng = np.random.RandomState(7)
    n = 3000
    g = rng.randint(0, 5, n)
    v = rng.randint(1, 400, n)
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(g, pa.int64()),
        "v": pa.array(v, pa.int64())})).repartition(8)
    qs = [0.1, 0.25, 0.5, 0.75, 0.9]
    got = _collect(grouped_quantile_cont(ds, ["g"], "v", qs))
    assert got.column_names == ["g", "p10", "p25", "p50", "p75", "p90"]
    for i, gid in enumerate(got["g"].to_pylist()):
        vs = v[g == gid]
        for q, nm in zip(qs, ["p10", "p25", "p50", "p75", "p90"]):
            want = np.percentile(vs, q * 100, method="linear")
            assert got[nm][i].as_py() == pytest.approx(want, abs=1e-9), \
                (gid, q)


def test_hand_computed_interpolation(ray_session):
    # group 1: values [10, 20, 30, 40] -> p25 at h=0.75: 10+0.75*10=17.5
    # group 2: single value -> every quantile is that value
    t = pa.table({"g": pa.array([1, 1, 1, 1, 2], pa.int64()),
                  "v": pa.array([40, 10, 30, 20, 99], pa.int64())})
    got = _collect(grouped_quantile_cont(
        ray.data.from_arrow(t), ["g"], "v", [0.25, 0.5, 0.75]))
    assert got["p25"][0].as_py() == pytest.approx(17.5)
    assert got["p50"][0].as_py() == pytest.approx(25.0)
    assert got["p75"][0].as_py() == pytest.approx(32.5)
    assert [got[c][1].as_py() for c in ("p25", "p50", "p75")] == [99.0] * 3


def test_repeated_values_and_nulls(ray_session):
    # duplicates collapse into counts; nulls are ignored like SQL
    t = pa.table({"g": pa.array([1] * 6, pa.int64()),
                  "v": pa.array([5, 5, 5, 9, None, 9], pa.int64())})
    got = _collect(grouped_quantile_cont(
        ray.data.from_arrow(t), ["g"], "v", [0.5],
        out_names=["med"]))
    # non-null sorted: [5,5,5,9,9]; h=2 -> exactly 5
    assert got["med"][0].as_py() == pytest.approx(5.0)


def test_multi_key_string_groups(ray_session):
    # composite (string, int) grouping: segments split on EITHER key
    rng = np.random.RandomState(11)
    n = 800
    s = np.array(["web", "wiki", "code"])[rng.randint(0, 3, n)]
    k2 = rng.randint(0, 2, n)
    v = rng.randint(1, 100, n)
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(s), "k2": pa.array(k2, pa.int64()),
        "v": pa.array(v, pa.int64())})).repartition(6)
    out = grouped_quantile_cont(ds, ["src", "k2"], "v", [0.5], ["med"])
    t = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")])
    t = t.sort_by([("src", "ascending"), ("k2", "ascending")])
    assert t.num_rows == 6
    for i in range(6):
        src, kk = t["src"][i].as_py(), t["k2"][i].as_py()
        vs = v[(s == src) & (k2 == kk)]
        assert t["med"][i].as_py() == pytest.approx(
            np.percentile(vs, 50, method="linear"), abs=1e-9)


def test_validation_errors(ray_session):
    t = pa.table({"g": pa.array([1], pa.int64()),
                  "v": pa.array([1], pa.int64())})
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError, match="no quantiles"):
        grouped_quantile_cont(ds, ["g"], "v", [])
    with pytest.raises(ValueError, match="outside"):
        grouped_quantile_cont(ds, ["g"], "v", [1.5])
    with pytest.raises(ValueError, match="length mismatch"):
        grouped_quantile_cont(ds, ["g"], "v", [0.5], out_names=["a", "b"])
