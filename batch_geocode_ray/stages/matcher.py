"""Gazetteer mention matcher — stateful actor-pool stage.

Replaces the reference's per-row HTTP geocoding fan-out
(query_funcs.py:178-191) with an offline Aho-Corasick scan: the
automaton over all gazetteer place-name token sequences is built ONCE
per actor in ``__init__`` from a `ray.put` broadcast of the gazetteer
(SURVEY §2.4), then every batch streams through it.

Usage:
    gaz_ref = ray.put(GazetteerIndex.from_table(gaz_table))
    ds = ds.map_batches(GazetteerMatcher, fn_constructor_kwargs={"gazetteer": gaz_ref},
                        batch_format="pyarrow", batch_size=cfg.batch_size,
                        concurrency=cfg.matcher_concurrency, num_cpus=1)

Emits a ``mentions`` column:
    list<struct<gazetteer_id:int64, name:string, start:int32, end:int32>>
with char spans into the page text; every occurrence of every gazetteer
phrase is emitted (overlaps included — per-source top-N trimming is the
resolver's job, mirroring how the reference collects all API results
before ranking/vetting).
"""

from __future__ import annotations

import re

import pyarrow as pa

from batch_geocode_ray.functions.ahocorasick import TokenAhoCorasick
from batch_geocode_ray.state.gazetteer import GazetteerIndex

_TOKEN_RE = re.compile(r"[a-z0-9]+")

MENTION_TYPE = pa.struct([
    ("gazetteer_id", pa.int64()),
    ("name", pa.string()),
    ("start", pa.int32()),
    ("end", pa.int32()),
])


class GazetteerMatcher:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, gazetteer, text_col: str = "text"):
        import ray

        gaz = ray.get(gazetteer) if isinstance(gazetteer, ray.ObjectRef) else gazetteer
        if isinstance(gaz, pa.Table):
            gaz = GazetteerIndex.from_table(gaz)
        self.gaz: GazetteerIndex = gaz
        self.text_col = text_col
        self.automaton = TokenAhoCorasick(gaz.phrases, list(range(len(gaz.phrases))))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        gaz = self.gaz
        find_all = self.automaton.find_all

        flat_gid: list[int] = []
        flat_name: list[str] = []
        flat_start: list[int] = []
        flat_end: list[int] = []
        offsets = [0]
        for text in texts:
            if text:
                toks_m = list(_TOKEN_RE.finditer(text.lower()))
                toks = [m.group() for m in toks_m]
                for t0, t1, entry in find_all(toks):
                    flat_gid.append(int(gaz.ids[entry]))
                    flat_name.append(gaz.names[entry])
                    flat_start.append(toks_m[t0].start())
                    flat_end.append(toks_m[t1 - 1].end())
            offsets.append(len(flat_gid))

        mentions = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.StructArray.from_arrays(
                [
                    pa.array(flat_gid, pa.int64()),
                    pa.array(flat_name, pa.string()),
                    pa.array(flat_start, pa.int32()),
                    pa.array(flat_end, pa.int32()),
                ],
                fields=list(MENTION_TYPE),
            ),
        )
        return batch.append_column("mentions", mentions)
