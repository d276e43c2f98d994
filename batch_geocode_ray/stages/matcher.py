"""Gazetteer mention matcher — stateful stage (actor pool or
worker-cached task pool; see pipelines/geocode).

Replaces the reference's per-row HTTP geocoding fan-out
(query_funcs.py:178-191) with offline matching of gazetteer phrases
against page text. Two equivalent engines:

  * VECTORIZED (default, ``emit_spans=False``): tokens come from the
    Arrow C++ tokenizer; each token maps to a vocab code via
    ``pc.index_in`` (C++); for every phrase length L present in the
    gazetteer, all length-L windows whose tokens are all in-vocab get a
    rolling splitmix key, binary-searched against the phrase-key table;
    hits are verified code-by-code (hash collisions cannot emit).
    Python touches only the (rare) verified hits. Mention start/end are
    TOKEN indices within the document.
  * Aho-Corasick (``emit_spans=True``): the original per-doc automaton
    scan over ``re.finditer`` tokens; start/end are CHARACTER offsets
    into the text. Use when downstream needs char spans (snippeting).

Both tokenize identically (lowercased [a-z0-9]+ runs), emit every
occurrence of every phrase (duplicates across sources included), and
are equality-tested against each other modulo the span unit.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from batch_geocode_ray.functions.ahocorasick import TokenAhoCorasick
from batch_geocode_ray.functions.hashing import splitmix64
from batch_geocode_ray.state.gazetteer import GazetteerIndex

_TOKEN_RE = re.compile(r"[a-z0-9]+")

MENTION_TYPE = pa.struct([
    ("gazetteer_id", pa.int64()),
    ("name", pa.string()),
    ("start", pa.int32()),
    ("end", pa.int32()),
])


def _phrase_key(codes: np.ndarray) -> np.ndarray:
    """Rolling combine over (L, n) code windows -> uint64 keys."""
    k = splitmix64(codes[0].astype(np.uint64))
    for j in range(1, len(codes)):
        k = splitmix64(k ^ codes[j].astype(np.uint64))
    return k


def _ascii_tokens(col: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Byte-level [a-z0-9]+ tokenizer over a lowered string column —
    pure NumPy over the Arrow buffers, no regex (an RE2 split measured
    6.4 us/page; this runs ~1 us/page and was the matcher's hottest
    kernel). Returns (flat token StringArray, parent row indices).

    Lowercasing is ``ascii_lower``: every non-[a-z0-9] byte is a
    separator either way, so the only divergence from a Unicode lower
    is exotic codepoints whose lowercase IS ascii (e.g. the Kelvin
    sign); gazetteer phrases are ascii, so match results are identical.
    """
    low = pc.ascii_lower(col)
    if low.null_count:
        low = low.fill_null("")
    offs_all = np.frombuffer(low.buffers()[1], dtype=np.int32)
    offs = offs_all[low.offset:low.offset + len(low) + 1]
    data = np.frombuffer(low.buffers()[2], dtype=np.uint8)
    a = data[offs[0]:offs[-1]]
    offs0 = (offs - offs[0]).astype(np.int64)
    is_tok = ((a >= 97) & (a <= 122)) | ((a >= 48) & (a <= 57))
    m = len(a)
    if m == 0:
        return pa.array([], pa.string()), np.empty(0, dtype=np.int64)
    prev = np.empty(m, dtype=bool)
    prev[0] = False
    prev[1:] = is_tok[:-1]
    nxt = np.empty(m, dtype=bool)
    nxt[-1] = False
    nxt[:-1] = is_tok[1:]
    inner = offs0[1:-1]  # row starts: token runs may not cross them
    prev[inner[inner < m]] = False
    before = inner - 1
    nxt[before[before >= 0]] = False
    starts = np.nonzero(is_tok & ~prev)[0]
    ends = np.nonzero(is_tok & ~nxt)[0] + 1
    lengths = ends - starts
    tok_offsets = np.concatenate(
        [[0], np.cumsum(lengths)]).astype(np.int32)
    compact = a[is_tok]  # token bytes in order; len == lengths.sum()
    tokens = pa.Array.from_buffers(
        pa.utf8(), len(starts),
        [None, pa.py_buffer(tok_offsets.tobytes()),
         pa.py_buffer(compact.tobytes())])
    parents = np.searchsorted(offs0, starts, side="right") - 1
    return tokens, parents


class GazetteerMatcher:
    """Callable class for ``map_batches`` (actor pool or cached task)."""

    def __init__(self, gazetteer, text_col: str = "text",
                 emit_spans: bool = False):
        import ray

        gaz = ray.get(gazetteer) if isinstance(gazetteer, ray.ObjectRef) else gazetteer
        if isinstance(gaz, pa.Table):
            gaz = GazetteerIndex.from_table(gaz)
        self.gaz: GazetteerIndex = gaz
        self.text_col = text_col
        self.emit_spans = emit_spans

        if emit_spans:
            self.automaton = TokenAhoCorasick(
                gaz.phrases, list(range(len(gaz.phrases))))
            return

        # ---- vectorized tables -------------------------------------
        vocab: dict[str, int] = {}
        for ph in gaz.phrases:
            for tok in ph:
                vocab.setdefault(tok, len(vocab))
        self.vocab_arr = pa.array(list(vocab), pa.string())
        # per phrase length: sorted key table -> entry-group offsets
        by_len: dict[int, list[int]] = {}
        for e, ph in enumerate(gaz.phrases):
            if ph:
                by_len.setdefault(len(ph), []).append(e)
        self.tables: dict[int, tuple] = {}
        for L, entries in by_len.items():
            codes = np.array(
                [[vocab[t] for t in gaz.phrases[e]] for e in entries],
                dtype=np.uint64).T            # (L, n_phrases)
            keys = _phrase_key(codes)
            order = np.argsort(keys, kind="stable")
            keys_s = keys[order]
            entries_s = np.array(entries, dtype=np.int64)[order]
            codes_s = codes[:, order]
            # group duplicates (same key: identical phrase in several
            # sources, or a rare hash collision — verification decides)
            bounds = np.concatenate(
                [[0], np.nonzero(np.diff(keys_s))[0] + 1, [len(keys_s)]])
            self.tables[L] = (keys_s[bounds[:-1]],   # unique keys
                              bounds,                # group offsets
                              entries_s,             # entry per slot
                              codes_s)               # codes per slot
        self.names_arr = np.array(gaz.names, dtype=object)

    # ------------------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.emit_spans:
            return self._call_spans(batch)
        return self._call_vectorized(batch)

    # ---- vectorized path ---------------------------------------------
    def _call_vectorized(self, batch: pa.Table) -> pa.Table:
        gaz = self.gaz
        n = batch.num_rows
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, parents = _ascii_tokens(col)
        codes = np.asarray(
            pc.index_in(flat, value_set=self.vocab_arr).fill_null(-1)
            .cast(pa.int64()).to_numpy(zero_copy_only=False))
        m = len(codes)
        # token index within each doc (for mention start/end)
        doc_counts = np.zeros(n, dtype=np.int64)
        np.add.at(doc_counts, parents, 1)
        doc_starts = np.concatenate([[0], np.cumsum(doc_counts)])[:-1]
        tok_idx = np.arange(m) - doc_starts[parents] if m else np.empty(0, np.int64)

        hit_rows: list[np.ndarray] = []
        hit_entry: list[np.ndarray] = []
        hit_start: list[np.ndarray] = []
        hit_end: list[np.ndarray] = []
        for L, (ukeys, bounds, entries_s, codes_s) in self.tables.items():
            if m < L:
                continue
            nwin = m - L + 1
            valid = parents[:nwin] == parents[L - 1:]
            win = codes[:nwin] >= 0
            for j in range(1, L):
                win = win & (codes[j:j + nwin] >= 0)
            valid &= win
            if not valid.any():
                continue
            pos0 = np.nonzero(valid)[0]
            wc = np.stack([codes[pos0 + j] for j in range(L)]).astype(np.uint64)
            keys = _phrase_key(wc)
            lookup = np.searchsorted(ukeys, keys)
            lookup_c = np.clip(lookup, 0, len(ukeys) - 1)
            cand = ukeys[lookup_c] == keys
            if not cand.any():
                continue
            cpos = np.nonzero(cand)[0]
            g = lookup_c[cpos]
            wc_c = wc[:, cpos]                      # (L, C)
            rows_c = parents[pos0[cpos]]
            starts_c = tok_idx[pos0[cpos]]
            gsize = bounds[g + 1] - bounds[g]
            # verify each candidate against its key-group's slots,
            # vectorized per slot offset (groups are tiny: duplicates
            # of one phrase across sources)
            for o in range(int(gsize.max())):
                has = o < gsize
                idxs = np.nonzero(has)[0]
                slot = bounds[g[idxs]] + o
                ok = (codes_s[:, slot] == wc_c[:, idxs]).all(axis=0)
                sel = idxs[ok]
                if len(sel):
                    hit_rows.append(rows_c[sel])
                    hit_entry.append(entries_s[slot[ok]])
                    hit_start.append(starts_c[sel])
                    hit_end.append(starts_c[sel] + L)

        if hit_rows:
            rows = np.concatenate(hit_rows).astype(np.int64)
            entry = np.concatenate(hit_entry).astype(np.int64)
            starts = np.concatenate(hit_start).astype(np.int64)
            ends = np.concatenate(hit_end).astype(np.int64)
            # stable order: by (row, start, entry) like a scan would emit
            order = np.lexsort((entry, starts, rows))
            rows, entry = rows[order], entry[order]
            starts, ends = starts[order], ends[order]
        else:
            rows = entry = starts = ends = np.empty(0, dtype=np.int64)

        counts = np.zeros(n, dtype=np.int64)
        np.add.at(counts, rows, 1)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        mentions = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.StructArray.from_arrays(
                [
                    pa.array(gaz.ids[entry], pa.int64()),
                    pa.array(self.names_arr[entry].tolist()
                             if len(entry) else [], pa.string()),
                    pa.array(starts.astype(np.int32), pa.int32()),
                    pa.array(ends.astype(np.int32), pa.int32()),
                ],
                fields=list(MENTION_TYPE),
            ),
        )
        return batch.append_column("mentions", mentions)

    # ---- char-span (Aho-Corasick) path --------------------------------
    def _call_spans(self, batch: pa.Table) -> pa.Table:
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
