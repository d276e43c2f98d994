"""HTML→text extraction stage (stateless map_batches).

First stage of the flagship pipeline. Recomputes ``text`` from ``html``
with the vectorized extractor — the per-row invariant is that this
equals the input's oracle ``text`` byte-for-byte per url (driver
BASELINE.json input_hint) — then DROPS the html column immediately so
the large binary payload never travels further down the pipeline
(SURVEY §4 memory note).
"""

from __future__ import annotations

import pyarrow as pa

from batch_geocode_ray.functions.text import extract_text_column


def extract_text_stage(batch: pa.Table, *, verify_against_input: bool = False) -> pa.Table:
    """Replace ``text`` with the extraction of ``html`` and drop ``html``.

    With ``verify_against_input=True`` (tests / canary runs) a mismatch
    against the input's oracle text column raises instead of silently
    diverging.
    """
    extracted = extract_text_column(batch["html"])
    if verify_against_input and "text" in batch.column_names:
        import pyarrow.compute as pc

        ok = pc.all(pc.equal(extracted, batch["text"].combine_chunks())).as_py()
        if not ok:
            bad = pc.not_equal(extracted, batch["text"].combine_chunks())
            urls = batch["url"].filter(bad).to_pylist()[:5]
            raise AssertionError(f"extract_text mismatch vs oracle for urls: {urls}")
    cols = {name: batch[name] for name in batch.column_names if name != "html"}
    cols["text"] = extracted
    return pa.table(cols)
