"""Broadcast (map-side) joins — the engine's default join strategy.

SURVEY §2.5: the reference's only join is a small left-join
(vet_geocode.py:106-111). At 10^12-row scale the rule is: when one side
fits in memory, `ray.put` it once and probe it inside ``map_batches`` —
the big side never shuffles. Shuffle joins exist in Ray Data
(``Dataset.join``) but every query here keeps the big side streaming.

Lookup structure: sorted key array + ``np.searchsorted`` for integer
keys (zero-copy, cache-friendly), dict fallback for strings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


class _Lookup:
    """Immutable small-side lookup, built once, broadcast via ray.put."""

    def __init__(self, table: pa.Table, key: str, value_cols: list[str]):
        keys = table[key]
        self.value_cols = value_cols
        if pa.types.is_integer(keys.type):
            k = np.asarray(keys.to_numpy(zero_copy_only=False), dtype=np.int64)
            order = np.argsort(k, kind="stable")
            self.int_keys = k[order]
            self.dict_keys = None
        else:
            order = np.arange(table.num_rows)
            self.int_keys = None
            self.dict_keys = {kk: i for i, kk in enumerate(keys.to_pylist())}
        self.values = {}
        for c in value_cols:
            col = table[c]
            if pa.types.is_floating(col.type) or pa.types.is_integer(col.type):
                self.values[c] = np.asarray(
                    col.to_numpy(zero_copy_only=False))[order]
            else:
                self.values[c] = np.array(col.to_pylist(), dtype=object)[order]

    def probe(self, key_arr: pa.Array | pa.ChunkedArray):
        """Returns (positions, found_mask) into the value arrays."""
        if self.int_keys is not None:
            k = np.asarray(
                key_arr.to_numpy(zero_copy_only=False), dtype=np.int64)
            pos = np.searchsorted(self.int_keys, k)
            pos_c = np.clip(pos, 0, len(self.int_keys) - 1)
            found = self.int_keys[pos_c] == k
            return pos_c, found
        keys = key_arr.to_pylist()
        pos = np.array([self.dict_keys.get(kk, -1) for kk in keys], dtype=np.int64)
        found = pos >= 0
        return np.clip(pos, 0, None), found


class BroadcastJoiner:
    """map_batches callable appending small-side columns by key.

    ``how="inner"`` drops unmatched rows; ``"left"`` keeps them with
    nulls. Constructed from a ray.ObjectRef so actors/tasks share one
    object-store copy of the lookup.
    """

    def __init__(self, lookup, key: str, how: str = "inner",
                 rename: dict[str, str] | None = None):
        self.lookup: _Lookup = (
            ray.get(lookup) if isinstance(lookup, ray.ObjectRef) else lookup)
        self.key = key
        self.how = how
        self.rename = rename or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        lk = self.lookup
        pos, found = lk.probe(batch[self.key])
        if self.how == "inner" and not found.all():
            batch = batch.filter(pa.array(found))
            pos = pos[found]
            found = found[:len(pos)]
            found = np.ones(len(pos), dtype=bool)
        for c in lk.value_cols:
            vals = lk.values[c][pos]
            out_name = self.rename.get(c, c)
            if vals.dtype == object:
                arr = pa.array(
                    [v if f else None for v, f in zip(vals, found)]
                    if not found.all() else vals.tolist(),
                    pa.string())
            else:
                arr = pa.array(np.where(found, vals, np.nan) if vals.dtype.kind == "f"
                               else vals, from_pandas=True)
                if vals.dtype.kind != "f" and not found.all():
                    arr = pa.array(vals, mask=~found)
            batch = batch.append_column(out_name, arr)
        return batch


def broadcast_semi_anti(ds: Dataset, small_keys, key: str,
                        anti: bool = False) -> Dataset:
    """Semi (keep rows whose key IS in the small set) or anti (keep rows
    whose key is NOT in it) join against a broadcast key set — the
    filter-shaped joins, no columns added, big side never shuffles.
    ``small_keys``: pa.Array / ChunkedArray / numpy of keys.
    """
    if isinstance(small_keys, (pa.Array, pa.ChunkedArray)):
        small_keys = small_keys.to_numpy(zero_copy_only=False)
    keys_sorted = np.unique(np.asarray(small_keys, dtype=np.int64))
    ref = ray.put(keys_sorted)

    def f(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        k = np.asarray(batch[key].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        pos = np.searchsorted(ks, k)
        pos_c = np.clip(pos, 0, len(ks) - 1)
        found = (ks[pos_c] == k) if len(ks) else np.zeros(len(k), dtype=bool)
        return batch.filter(pa.array(~found if anti else found))

    return ds.map_batches(f, batch_format="pyarrow")


def broadcast_join(ds: Dataset, small: pa.Table, key: str,
                   value_cols: list[str], how: str = "inner",
                   rename: dict[str, str] | None = None) -> Dataset:
    """Join ``small``'s ``value_cols`` onto ``ds`` by ``key`` without
    shuffling ``ds``. The small side is put into the object store ONCE
    (not re-shipped per batch/task)."""
    ref = ray.put(_Lookup(small, key, value_cols))
    return ds.map_batches(
        BroadcastJoiner,
        fn_constructor_kwargs={"lookup": ref, "key": key, "how": how,
                               "rename": rename},
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=0.5,
    )
