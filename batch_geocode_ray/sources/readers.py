"""Input readers (SURVEY §2.1 S1/S2, §2.2 M5).

The engine's native source is typed Parquet (``ray.data.read_parquet``
— no sniffing needed). These helpers port the reference's
*CSV-with-unknown-encoding* intake (reference geocode/utilities.py:
170-197 ``read_to_pandas``; :131-150 ``read_and_prep_input``) for the
small side inputs (gazetteers, facility lists, address batches) that
still arrive as CSV from humans:

  * encoding resolution tries the caller's encoding, then utf-8,
    latin1, then every codec Python knows — exactly the reference's
    fallback ladder;
  * returns ``(table, encoding, error)`` matching the reference's
    3-tuple contract;
  * ``validate_columns`` ports utilities.py:162-167.
"""

from __future__ import annotations

import codecs
import encodings.aliases
import io

import pyarrow as pa
import pyarrow.csv as pacsv


def _encoding_ladder(preferred: str | None) -> list[str]:
    ladder = []
    if preferred:
        ladder.append(preferred)
    ladder += ["utf-8", "latin1"]
    seen = {codecs.lookup(e).name for e in ladder}
    for alias in sorted(set(encodings.aliases.aliases.values())):
        try:
            name = codecs.lookup(alias).name
        except LookupError:
            continue
        if name not in seen:
            seen.add(name)
            ladder.append(alias)
    return ladder


def read_csv_auto(path_or_bytes, encoding: str | None = None):
    """CSV reader with the reference's brute-force encoding sweep.

    Accepts a path or raw bytes. Returns ``(pyarrow.Table | None,
    resolved_encoding | None, error | None)`` — the reference's
    read_to_pandas contract (utilities.py:192-197: error string on
    total failure, otherwise the first encoding that decodes).
    """
    raw = (path_or_bytes if isinstance(path_or_bytes, (bytes, bytearray))
           else open(path_or_bytes, "rb").read())
    last_err = None
    for enc in _encoding_ladder(encoding):
        try:
            text = raw.decode(enc)
        except (UnicodeDecodeError, LookupError) as e:
            last_err = e
            continue
        try:
            table = pacsv.read_csv(io.BytesIO(text.encode("utf-8")))
        except pa.lib.ArrowInvalid as e:
            return None, enc, f"CSV parse error: {e}"
        return table, enc, None
    return None, None, f"could not decode input with any known encoding: {last_err}"


def validate_columns(table: pa.Table, address_col: str,
                     iso_col: str | None = None) -> str | None:
    """Column-presence check (reference utilities.py:162-167): returns
    None when valid, else the error message naming missing columns."""
    missing = [c for c in [address_col, iso_col]
               if c is not None and c not in table.column_names]
    if missing:
        return (f"Input data is missing required column(s): "
                f"{', '.join(missing)}")
    return None


def read_table_auto(path_or_bytes, encoding: str | None = None,
                    filename: str | None = None):
    """Extension-dispatched intake, porting the reference's
    ``read_excel`` vs ``read_csv`` pick (utilities.py:174): ``.xlsx``
    parses via the stdlib OOXML reader (sources/xlsx.py — no codec
    library exists in this environment), anything else goes through the
    CSV encoding sweep. Same ``(table, encoding, error)`` contract;
    xlsx resolves encoding as 'utf-8' (zip/XML is self-describing).
    For bytes input pass ``filename`` so the extension is known.
    """
    name = filename or (path_or_bytes if isinstance(path_or_bytes, str)
                        else "")
    if str(name).lower().endswith((".xlsx", ".xlsm")):
        from batch_geocode_ray.sources.xlsx import read_xlsx

        try:
            return read_xlsx(path_or_bytes), "utf-8", None
        except Exception as e:  # bad zip/XML -> reference-style error
            return None, None, f"could not parse xlsx: {e}"
    if str(name).lower().endswith((".json", ".jsonl", ".ndjson")):
        # newline-delimited JSON intake (the common web-corpus sidecar
        # format); the distributed path for big inputs is
        # ray.data.read_json — this is the driver-side upload intake
        import io

        import pyarrow.json as pajson

        try:
            buf = (io.BytesIO(path_or_bytes)
                   if isinstance(path_or_bytes, (bytes, bytearray))
                   else path_or_bytes)
            return pajson.read_json(buf), "utf-8", None
        except Exception as e:
            return None, None, f"could not parse json: {e}"
    return read_csv_auto(path_or_bytes, encoding)
