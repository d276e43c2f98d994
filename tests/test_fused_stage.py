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


def test_stateful_mode_auto_threshold(monkeypatch):
    """auto -> task below AUTO_ACTOR_STATE_BYTES of broadcast-input
    bytes, actor at/above; explicit modes pass through; the pipeline
    output is mode-independent (pinned by test_fused_equals_unfused)."""
    import batch_geocode_ray.pipelines.geocode as g
    from batch_geocode_ray.sources.fixtures import generate_world

    w = generate_world()
    small = w.gazetteer.nbytes + w.admin_polygons.nbytes
    assert g._resolve_stateful_mode(
        "auto", w.gazetteer, w.admin_polygons, None) == "task"
    monkeypatch.setattr(g, "AUTO_ACTOR_STATE_BYTES", small)
    assert g._resolve_stateful_mode(
        "auto", w.gazetteer, w.admin_polygons, None) == "actor"
    monkeypatch.setattr(g, "AUTO_ACTOR_STATE_BYTES", small + 1)
    assert g._resolve_stateful_mode(
        "auto", w.gazetteer, w.admin_polygons, None) == "task"
    # facilities count toward the state only when broadcast
    monkeypatch.setattr(g, "AUTO_ACTOR_STATE_BYTES",
                        small + w.facilities.nbytes)
    assert g._resolve_stateful_mode(
        "auto", w.gazetteer, w.admin_polygons, w.facilities) == "actor"
    # explicit modes never re-resolve
    monkeypatch.setattr(g, "AUTO_ACTOR_STATE_BYTES", 0)
    assert g._resolve_stateful_mode(
        "task", w.gazetteer, None, None) == "task"
    assert g._resolve_stateful_mode(
        "actor", w.gazetteer, None, None) == "actor"


def test_read_num_blocks_sizing(tmp_path):
    """Read-block sizing: ~32MB blocks with a 3-tasks/CPU floor for big
    inputs, but never sub-MB blocks for small inputs (the floor once
    sliced a 14MB fixture into 96 tiny blocks — 2x slower)."""
    import ray

    from batch_geocode_ray.pipelines.geocode import _read_num_blocks

    cpus = int(ray.cluster_resources().get("CPU", 4))
    p = tmp_path / "small.bin"
    p.write_bytes(b"x" * (14 << 20))  # 14MB
    n = _read_num_blocks(str(p))
    assert n is not None and n <= 14  # >= ~1MB per block
    big = tmp_path / "big.bin"
    big.write_bytes(b"x" * (64 << 20))
    big_total = 100 * (64 << 20)  # simulate via many paths
    n_big = _read_num_blocks([str(big)] * 100)
    assert n_big == max(3 * cpus, big_total // (32 << 20))
    assert _read_num_blocks(str(tmp_path / "missing")) is None


def test_bench_world_flagship_plan_unchanged_by_r5():
    """Scaling-record inheritance witness (BASELINE.md round-5): the
    two round-5 flagship-path changes are provably inactive at the
    bench fixture's configuration — (a) the bench world's polygon set
    is small enough that the PIP R-tree builds NO internal levels, so
    assign() runs the identical pre-r5 linear leaf scan; (b)
    stateful_mode='auto' resolves to 'task', the pre-r5 default. With
    both pinned, the measured r3 clean-window scaling record applies
    to this build's physical plan."""
    import batch_geocode_ray.pipelines.geocode as g
    from batch_geocode_ray.sources.fixtures import generate_world
    from batch_geocode_ray.stages.pip import PolygonIndex

    w = generate_world()
    idx = PolygonIndex(w.admin_polygons)
    assert idx.inner_levels == []
    assert g._resolve_stateful_mode(
        "auto", w.gazetteer, w.admin_polygons, w.facilities) == "task"
