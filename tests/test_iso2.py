"""ISO2 validation parity (reference utilities.py:85-118, check_iso
query_funcs.py:26-33)."""

import pyarrow as pa
import ray.data as rd

from batch_geocode_ray.functions.iso2 import (
    VALID_ISO2,
    invalid_iso2_in_batch,
    normalize_iso,
    validate_iso2_dataset,
)


def test_whitelist_size():
    assert len(VALID_ISO2) == 249


def test_normalize_iso_semantics():
    col = pa.array(["US", "gb", "USA", "", None, "fr"])
    out = normalize_iso(col).to_pylist()
    # 2-char -> lowercase, anything else -> null (check_iso)
    assert out == ["us", "gb", None, None, None, "fr"]


def test_invalid_iso2_in_batch():
    col = pa.array(["us", "GB", "XX", "zz", None])
    assert invalid_iso2_in_batch(col) == {"XX", "ZZ"}


def test_validate_iso2_dataset_contract():
    ok = rd.from_arrow(pa.table({"iso2": pa.array(["us", "gb", "fr"] * 10)}))
    assert validate_iso2_dataset(ok) is None
    one_bad = rd.from_arrow(pa.table({"iso2": pa.array(["us", "xx"])}))
    assert validate_iso2_dataset(one_bad) == "XX"
    two_bad = rd.from_arrow(pa.table({"iso2": pa.array(["xx", "zz", "us"])}))
    assert validate_iso2_dataset(two_bad) == "XX, ZZ"
