"""Fused vs unfused flagship pipeline must produce identical output
(the fused actor stage is a physical-plan choice, not a semantic one)."""

import pyarrow as pa

from batch_geocode_ray.pipelines.geocode import build_geocode_pipeline
from batch_geocode_ray.sources.fixtures import ensure_fixture_dir, generate_world


def collect(ds):
    rows = [r for t in ds.iter_batches(batch_format="pyarrow")
            for r in t.to_pylist()]
    return sorted(rows, key=lambda r: r["url"])


def test_fused_equals_unfused():
    d = ensure_fixture_dir(300)
    w = generate_world()
    kwargs = dict(
        gazetteer=w.gazetteer,
        admin_polygons=w.admin_polygons,
        facilities=w.facilities,
        with_knn=True,
    )
    fused = collect(build_geocode_pipeline(f"{d}/pages", fused=True, **kwargs))
    unfused = collect(build_geocode_pipeline(f"{d}/pages", fused=False, **kwargs))
    actor = collect(build_geocode_pipeline(f"{d}/pages", fused=True,
                                           stateful_mode="actor", **kwargs))
    assert len(fused) == len(unfused) == len(actor) == 300
    assert fused[0].keys() == unfused[0].keys()
    for a, b, c in zip(fused, unfused, actor):
        assert a == b == c
