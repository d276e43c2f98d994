"""ISO2 country-code validation.

The whitelist is the 249-entry set hard-coded in the reference
(/root/reference/geocode/utilities.py:85-118, validate_iso2); the ISO
normalizer mirrors check_iso (query_funcs.py:26-33): a 2-char string
lowercases, anything else becomes null.

Engine form: vectorized Arrow/NumPy masks usable inside map_batches,
plus a distributed distinct-validation that pre-aggregates per batch
(pc.unique partial) before a tiny driver-side merge — the scalable
version of the reference's DataFrame-wide ``.unique()``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Verbatim from reference utilities.py:87-106 (order irrelevant; membership set).
VALID_ISO2 = frozenset([
    "AF", "AX", "AL", "DZ", "AS", "AD", "AO", "AI", "AQ", "AG",
    "AR", "AM", "AW", "AU", "AT", "AZ", "BH", "BS", "BD", "BB", "BY", "BE", "BZ",
    "BJ", "BM", "BT", "BO", "BQ", "BA", "BW", "BV", "BR", "IO", "BN", "BG", "BF",
    "BI", "KH", "CM", "CA", "CV", "KY", "CF", "TD", "CL", "CN", "CX", "CC", "CO",
    "KM", "CG", "CD", "CK", "CR", "CI", "HR", "CU", "CW", "CY", "CZ", "DK", "DJ",
    "DM", "DO", "EC", "EG", "SV", "GQ", "ER", "EE", "ET", "FK", "FO", "FJ", "FI",
    "FR", "GF", "PF", "TF", "GA", "GM", "GE", "DE", "GH", "GI", "GR", "GL", "GD",
    "GP", "GU", "GT", "GG", "GN", "GW", "GY", "HT", "HM", "VA", "HN", "HK", "HU",
    "IS", "IN", "ID", "IR", "IQ", "IE", "IM", "IL", "IT", "JM", "JP", "JE", "JO",
    "KZ", "KE", "KI", "KP", "KR", "KW", "KG", "LA", "LV", "LB", "LS", "LR", "LY",
    "LI", "LT", "LU", "MO", "MK", "MG", "MW", "MY", "MV", "ML", "MT", "MH", "MQ",
    "MR", "MU", "YT", "MX", "FM", "MD", "MC", "MN", "ME", "MS", "MA", "MZ", "MM",
    "NA", "NR", "NP", "NL", "NC", "NZ", "NI", "NE", "NG", "NU", "NF", "MP", "NO",
    "OM", "PK", "PW", "PS", "PA", "PG", "PY", "PE", "PH", "PN", "PL", "PT", "PR",
    "QA", "RE", "RO", "RU", "RW", "BL", "SH", "KN", "LC", "MF", "PM", "VC", "WS",
    "SM", "ST", "SA", "SN", "RS", "SC", "SL", "SG", "SX", "SK", "SI", "SB", "SO",
    "ZA", "GS", "SS", "ES", "LK", "SD", "SR", "SJ", "SZ", "SE", "CH", "SY", "TW",
    "TJ", "TZ", "TH", "TL", "TG", "TK", "TO", "TT", "TN", "TR", "TM", "TC", "TV",
    "UG", "UA", "AE", "GB", "US", "UM", "UY", "UZ", "VU", "VE", "VN", "VG", "VI",
    "WF", "EH", "YE", "ZM", "ZW",
])


def normalize_iso(iso_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """check_iso semantics (query_funcs.py:26-33), vectorized: values that
    are exactly-2-char strings lowercase; everything else (wrong length,
    null) becomes null.
    """
    if isinstance(iso_col, pa.ChunkedArray):
        iso_col = iso_col.combine_chunks()
    is_len2 = pc.equal(pc.utf8_length(iso_col), 2)
    lowered = pc.utf8_lower(iso_col)
    return pc.if_else(pc.fill_null(is_len2, False), lowered, pa.nulls(len(iso_col), pa.string()))


def invalid_iso2_in_batch(iso_col: pa.Array | pa.ChunkedArray) -> set[str]:
    """Per-batch partial of the reference's validate_iso2: distinct
    uppercased values not in the whitelist. Merge the per-batch sets with
    set-union (tiny) for the global answer.
    """
    uniq = pc.unique(pc.utf8_upper(
        iso_col.combine_chunks() if isinstance(iso_col, pa.ChunkedArray) else iso_col))
    vals = {v for v in uniq.to_pylist() if v is not None}
    return vals - VALID_ISO2


def validate_iso2_dataset(ds) -> str | None:
    """Distributed validate_iso2 over a Dataset's ``iso2`` column.

    Returns None when every distinct value is whitelisted, else the
    offending values joined with ", " (single value returned bare),
    matching reference utilities.py:107-118's return contract.
    """
    parts = ds.map_batches(
        lambda t: pa.table({"bad": pa.array(sorted(invalid_iso2_in_batch(t["iso2"])) or [None],
                                            type=pa.string())}),
        batch_format="pyarrow",
    )
    bad: set[str] = set()
    for b in parts.iter_batches(batch_format="pyarrow"):
        bad.update(v for v in b["bad"].to_pylist() if v is not None)
    if not bad:
        return None
    out = sorted(bad)
    return ", ".join(out) if len(out) > 1 else out[0]
