"""End-to-end parity: Ray flagship pipeline vs the naive single-process
oracle on the deterministic fixture (SURVEY §5.2), including the
byte-identical text-extraction invariant."""

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from batch_geocode_ray.config import PipelineConfig
from batch_geocode_ray.pipelines.geocode import (
    build_geocode_pipeline,
    build_tile_aggregates,
)
from batch_geocode_ray.sources.fixtures import (
    LANG_CC_PRIOR,
    ensure_fixture_dir,
    generate_world,
)

from .oracle import run_oracle

N_PAGES = 300


@pytest.fixture(scope="module")
def fixture_dir():
    return ensure_fixture_dir(N_PAGES)


@pytest.fixture(scope="module")
def world():
    return generate_world()


@pytest.fixture(scope="module")
def ray_result(fixture_dir, world):
    ds = build_geocode_pipeline(
        f"{fixture_dir}/pages",
        world.gazetteer,
        admin_polygons=world.admin_polygons,
        facilities=world.facilities,
        verify_extraction=True,   # raises on any text-extraction drift
        with_knn=True,
    )
    tiles = build_tile_aggregates(ds, res=7).to_pandas()
    # int64 cell ids exceed float64 precision -> collect as Arrow, not pandas
    pages = [row for t in ds.iter_batches(batch_format="pyarrow")
             for row in t.to_pylist()]
    return pages, tiles


@pytest.fixture(scope="module")
def oracle_result(fixture_dir, world):
    pages = pq.read_table(f"{fixture_dir}/pages")
    return run_oracle(pages, world.gazetteer, world.admin_polygons,
                      world.facilities, LANG_CC_PRIOR)


def _approx(a, b, tol=1e-9):
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        return (a is None or math.isnan(a)) and (b is None or (isinstance(b, float) and math.isnan(b)))
    return math.isclose(a, b, rel_tol=tol, abs_tol=tol)


def test_pages_match_oracle(ray_result, oracle_result):
    got_rows, _ = ray_result
    want_rows, _ = oracle_result
    got = {r["url"]: r for r in got_rows}
    assert len(got) == len(want_rows) == N_PAGES
    n_best = 0
    for want in want_rows:
        g = got[want["url"]]
        for col, w in want.items():
            if col in ("url", "knn_ids", "knn_dists"):
                continue
            v = g.get(col)
            if isinstance(v, float) and math.isnan(v):
                v = None
            if isinstance(w, float):
                assert _approx(v, w), f"{want['url']} {col}: {v} != {w}"
            elif col.startswith(("hex_cell", "s2_cell")):
                assert (v is None and w is None) or int(v) == w, f"{want['url']} {col}"
            else:
                assert v == w, f"{want['url']} {col}: {v!r} != {w!r}"
        # kNN lists
        assert list(g["knn_ids"]) == want["knn_ids"], want["url"]
        for dv, dw in zip(g["knn_dists"], want["knn_dists"]):
            assert _approx(dv, dw)
        if want["best_name"] is not None:
            n_best += 1
    # the fixture must actually exercise the interesting paths
    assert n_best > 20


def test_fixture_exercises_vetting_paths(oracle_result):
    want_rows, _ = oracle_result
    # some pages have candidates but NO composite best (vetted out / too spread)
    some_cand_no_best = sum(
        1 for r in want_rows
        if r["best_name"] is None and any(
            r[f"{p}_name"] is not None for p in ("FG1", "GM1", "GN1", "OSM1"))
    )
    assert some_cand_no_best > 0
    # some admin assignments hit province level (1), some fall outside all polygons
    levels = {r["admin_level"] for r in want_rows}
    assert 1 in levels and -1 in levels


def test_tiles_match_oracle(ray_result, oracle_result):
    _, got_tiles = ray_result
    _, want_tiles = oracle_result
    got = got_tiles.to_dict("records")
    assert len(got) == len(want_tiles)
    for g, w in zip(got, want_tiles):  # both sorted by cell
        assert int(g["hex_cell_r7"]) == w["hex_cell_r7"]
        assert int(g["pages"]) == w["pages"]
        for c in ("mean_buffer", "min_buffer", "max_buffer"):
            assert _approx(g[c], w[c], tol=1e-6)


def test_hot_cell_skew_present(oracle_result):
    # fixture skew knob: the mega-city tile dominates
    _, want_tiles = oracle_result
    counts = sorted((t["pages"] for t in want_tiles), reverse=True)
    assert counts[0] >= 5 * (counts[1] if len(counts) > 1 else 1)
