"""CSV encoding-sweep reader, column validation, vet split/merge, and
the CLI runner (in-process, resumable)."""

import os

import pyarrow as pa
import pytest
import ray.data as rd

from batch_geocode_ray.pipelines.vet import geo_column_names, vet_merge, vet_split
from batch_geocode_ray.sources.readers import read_csv_auto, validate_columns


def test_read_csv_auto_utf8():
    t, enc, err = read_csv_auto(b"a,b\n1,caf\xc3\xa9\n")
    assert err is None and enc == "utf-8"
    assert t["b"].to_pylist() == ["café"]


def test_read_csv_auto_latin1_fallback():
    # invalid utf-8 byte sequence, valid latin1
    t, enc, err = read_csv_auto(b"a,b\n1,caf\xe9\n")
    assert err is None and enc == "latin1"
    assert t["b"].to_pylist() == ["café"]


def test_read_csv_auto_preferred_encoding():
    t, enc, err = read_csv_auto("a,b\n1,x\n".encode("utf-16"), encoding="utf-16")
    assert err is None and enc == "utf-16"
    assert t["a"].to_pylist() == [1]


def test_read_csv_auto_parse_error():
    t, enc, err = read_csv_auto(b"a,b\n1,2,3\n")  # ragged row
    assert t is None and err is not None and "parse" in err.lower()


def test_validate_columns():
    t = pa.table({"for_geocoding": pa.array(["x"]), "iso2": pa.array(["us"])})
    assert validate_columns(t, "for_geocoding", "iso2") is None
    msg = validate_columns(t, "address", "country")
    assert "address" in msg and "country" in msg


def test_geo_column_names():
    cols = ["url", "lang", "GM1_name", "GM1_lat", "best_buffer", "other"]
    geo = geo_column_names(cols, address_col="lang")
    assert set(geo) == {"GM1_name", "GM1_lat", "best_buffer", "lang"}


def test_vet_split_merge_roundtrip():
    wide = pa.table({
        "url": pa.array(["u1", "u2", "u3"]),
        "warc_ts": pa.array([1, 2, 3], pa.int64()),
        "best_name": pa.array(["Vetted", None, "Vetted"]),
        "best_lat": pa.array([1.0, None, 3.0]),
    })
    ds = rd.from_arrow(wide)
    meta, geo = vet_split(ds, "url")
    assert set(meta.schema().names) == {"url", "warc_ts"}
    assert set(geo.schema().names) == {"url", "best_name", "best_lat"}

    # human edits u1's geo row, drops u3 entirely (left-join nulls)
    edited = pa.table({
        "url": pa.array(["u1", "u2"]),
        "best_name": pa.array(["Vetted (from GM1)", "Manual"]),
        "best_lat": pa.array([1.5, 2.5]),
    })
    merged = {r["url"]: r for r in vet_merge(meta, edited, "url").take_all()}
    assert merged["u1"]["best_name"] == "Vetted (from GM1)"
    assert merged["u1"]["best_lat"] == 1.5
    assert merged["u2"]["best_lat"] == 2.5
    assert merged["u3"]["best_name"] is None  # left join kept the row
    assert merged["u3"]["warc_ts"] == 3


def test_cli_runner_resume(tmp_path):
    from batch_geocode_ray.run import main

    out = str(tmp_path / "out")
    args = ["--demo", "12000", "--out", out, "--tiles", "7",
            "--files-per-partition", "1"]
    s1 = main(args)
    assert s1["partitions"] == 3 and s1["computed"] == 3  # 5k-row shards
    assert s1["rows_out"] == 12000
    assert os.path.exists(os.path.join(out, "run_summary.json"))
    s2 = main(args)
    assert s2["computed"] == 0 and s2["skipped_resume"] == 3

    # reference-shaped CSV export off the checkpointed output
    csv_path = str(tmp_path / "wide.csv")
    s3 = main(args + ["--csv-out", csv_path])
    assert s3["csv_rows"] == 12000
    with open(csv_path) as f:
        header = [c.strip('"') for c in f.readline().strip().split(",")]
    assert "best_name" in header and "GM1_buffer" in header
