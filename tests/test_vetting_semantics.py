"""Targeted parity tests for the reference's vetting/ranking semantics
(query_funcs.py:193-219, :376; batch_geocode.py:29-38) on handcrafted
inputs where the expected answer is computed by hand."""

import numpy as np
import pyarrow as pa

from batch_geocode_ray.config import PipelineConfig
from batch_geocode_ray.functions.geo import haversine_km
from batch_geocode_ray.stages.matcher import GazetteerMatcher
from batch_geocode_ray.stages.resolve import MentionResolver
from batch_geocode_ray.state.gazetteer import GazetteerIndex


def gaz_table(rows):
    cols = {
        "gazetteer_id": pa.array([r[0] for r in rows], pa.int64()),
        "name": pa.array([r[1] for r in rows], pa.string()),
        "lat": pa.array([r[2] for r in rows], pa.float64()),
        "lon": pa.array([r[3] for r in rows], pa.float64()),
        "bb_n": pa.array([r[4] for r in rows], pa.float64()),
        "bb_s": pa.array([r[5] for r in rows], pa.float64()),
        "bb_e": pa.array([r[6] for r in rows], pa.float64()),
        "bb_w": pa.array([r[7] for r in rows], pa.float64()),
        "cc": pa.array([r[8] for r in rows], pa.string()),
        "type": pa.array([r[9] for r in rows], pa.string()),
        "population": pa.array([r[10] for r in rows], pa.int64()),
        "source": pa.array([r[11] for r in rows], pa.string()),
    }
    return pa.table(cols)


def run(pages_text, gaz, langs=None, prior=None, cfg=None):
    idx = GazetteerIndex.from_table(gaz)
    cfg = cfg or PipelineConfig(sources=idx.sources)
    batch = pa.table({
        "url": pa.array([f"u{i}" for i in range(len(pages_text))]),
        "text": pa.array(pages_text),
        "lang": pa.array(langs or ["en"] * len(pages_text)),
    })
    matched = GazetteerMatcher(idx)(batch)
    return MentionResolver(idx, config=cfg, lang_cc_prior=prior,
                           keep_columns=["url"])(matched).to_pylist()


def test_oversized_buffer_vetted_out():
    # one admin area with a huge bbox (diag >> 15km) -> its prefix is null
    gaz = gaz_table([
        (0, "Bigland", 10.0, 10.0, 12.0, 8.0, 12.0, 8.0, "US", "admin_area", 100, "GM"),
    ])
    (row,) = run(["a story about Bigland today"], gaz)
    assert row["GM1_name"] is None
    assert row["best_name"] is None


def test_small_bbox_admin_survives_and_is_best():
    # bbox diag well under 15 km
    gaz = gaz_table([
        (0, "Tinytown", 10.0, 10.0, 10.02, 9.98, 10.02, 9.98, "US", "admin_area", 100, "GM"),
    ])
    (row,) = run(["news from Tinytown"], gaz)
    assert row["GM1_name"] == "Tinytown"
    assert row["GM1_lat"] == 10.0  # bbox centroid
    assert row["best_name"] == "Vetted"
    assert row["best_type"] == "Composite of 1 geocoded locations"


def test_two_agreeing_sources_composite_best():
    gaz = gaz_table([
        (0, "Sametown", 10.0, 10.0, None, None, None, None, "US", "populated_place", 100, "GM"),
        (1, "Sametown", 10.001, 10.001, None, None, None, None, "US", "populated_place", 100, "OSM"),
    ])
    (row,) = run(["Sametown bulletin"], gaz)
    assert row["GM1_name"] == "Sametown" and row["OSM1_name"] == "Sametown"
    assert row["best_type"] == "Composite of 2 geocoded locations"
    assert abs(row["best_lat"] - 10.0005) < 1e-12
    # best buffer = haversine across the pooled 2-point bbox
    expect = float(haversine_km(10.0, 10.0, 10.001, 10.001))
    assert abs(row["best_buffer"] - expect) < 1e-12


def test_disagreeing_sources_no_best():
    # two far-apart survivors pool to a huge bbox -> no composite best,
    # but both per-source results remain (reference keeps them)
    gaz = gaz_table([
        (0, "Splitville", 10.0, 10.0, None, None, None, None, "US", "populated_place", 100, "GM"),
        (1, "Splitville", 40.0, 40.0, None, None, None, None, "US", "populated_place", 100, "OSM"),
    ])
    (row,) = run(["Splitville report"], gaz)
    assert row["GM1_name"] == "Splitville" and row["OSM1_name"] == "Splitville"
    assert row["best_name"] is None


def test_per_source_topn_population_rank():
    # three same-source candidates; results_per_app=2 keeps the two most
    # populous; rank 1 = biggest population
    gaz = gaz_table([
        (0, "Alpha", 10.0, 10.0, None, None, None, None, "US", "populated_place", 50, "GM"),
        (1, "Beta", 11.0, 11.0, None, None, None, None, "US", "populated_place", 500, "GM"),
        (2, "Gamma", 12.0, 12.0, None, None, None, None, "US", "populated_place", 5, "GM"),
    ])
    (row,) = run(["Alpha then Beta then Gamma"], gaz)
    assert row["GM1_name"] == "Beta"
    assert row["GM2_name"] == "Alpha"
    # Gamma fell off the top-2; and no renumbering happened
    assert "GM3_name" not in row


def test_country_filter_keep_unsure():
    prior = {"en": frozenset({"US"})}
    gaz = gaz_table([
        # wrong-country candidate -> filtered
        (0, "Duoville", 10.0, 10.0, None, None, None, None, "FR", "populated_place", 100, "GM"),
        # no-cc candidate -> kept (OSM keep-unsure rule)
        (1, "Duoville", 20.0, 20.0, None, None, None, None, None, "populated_place", 90, "OSM"),
    ])
    (row,) = run(["Duoville times"], gaz, langs=["en"], prior=prior)
    assert row["GM1_name"] is None
    assert row["OSM1_name"] == "Duoville"


def test_unknown_lang_keeps_everything():
    prior = {"en": frozenset({"US"})}
    gaz = gaz_table([
        (0, "Duoville", 10.0, 10.0, None, None, None, None, "FR", "populated_place", 100, "GM"),
    ])
    (row,) = run(["Duoville gazette"], gaz, langs=["xx"], prior=prior)
    assert row["GM1_name"] == "Duoville"


def test_wide_column_order_reference_rule():
    # case-insensitive sorted prefixes with best first, x suffixes
    # (reference batch_geocode.py:29-38 + utilities.py:42-45)
    cfg = PipelineConfig(sources=["GM", "OSM", "GN", "FG"], results_per_app=2)
    prefixes = cfg.wide_prefixes()
    assert prefixes == ["best", "FG1", "FG2", "GM1", "GM2", "GN1", "GN2",
                        "OSM1", "OSM2"]
    cols = cfg.wide_columns()
    assert cols[:5] == ["best_name", "best_type", "best_lat", "best_long", "best_buffer"]
    assert len(cols) == 9 * 5


def test_no_mentions_all_null_columns_present():
    gaz = gaz_table([
        (0, "Somewhere", 10.0, 10.0, None, None, None, None, "US", "populated_place", 100, "GM"),
    ])
    (row,) = run(["no places are mentioned here"], gaz)
    cfg = PipelineConfig(sources=["GM"])
    for p in cfg.wide_prefixes():
        for s in ("name", "type", "lat", "long", "buffer"):
            assert row[f"{p}_{s}"] is None


def test_multiple_occurrences_resolve_once():
    gaz = gaz_table([
        (0, "Echo City", 10.0, 10.0, None, None, None, None, "US", "populated_place", 100, "GM"),
    ])
    (row,) = run(["Echo City again Echo City and Echo City"], gaz)
    assert row["GM1_name"] == "Echo City"
    assert row["GM2_name"] is None  # not duplicated into rank 2
    assert row["best_type"] == "Composite of 1 geocoded locations"
