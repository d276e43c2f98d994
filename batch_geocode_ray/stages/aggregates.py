"""Tile / summary aggregation (SURVEY §2.6 A3/A4) — shuffle-light.

The scalable shape: **pre-aggregate inside map_batches** (pyarrow's C++
hash group-by collapses each batch to one row per cell — a hot
mega-city cell collapses to ONE partial row per batch, which is what
kills skew), then a small ``groupby(cell).aggregate(Sum/Min/Max)``
over the partials, then a cheap finalize (mean = sum/count). The
all-to-all exchange only ever carries ~n_cells x n_blocks rows, not
n_pages.

``salted_groupby_map_groups`` is the explicit salted two-stage pattern
for group logic that can't pre-combine (arbitrary ``map_groups`` fns):
groupby((key, salt)) partial -> groupby(key) final. A correctness test
pins salted == unsalted.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum


def cell_partial_aggregate(batch: pa.Table, cell_col: str, buffer_col: str = "best_buffer") -> pa.Table:
    """Per-batch combiner: one row per cell with count / sum / min / max
    of the buffer column (null buffers excluded from stats but counted
    as pages)."""
    t = pa.table({
        cell_col: batch[cell_col],
        "_buf": batch[buffer_col],
        "_has": pc.is_valid(batch[buffer_col]).cast(pa.int64()),
    })
    g = t.group_by(cell_col).aggregate([
        ("_buf", "sum"),
        ("_buf", "min"),
        ("_buf", "max"),
        ("_has", "sum"),
        (cell_col, "count"),
    ])
    return g.rename_columns([cell_col, "buf_sum", "buf_min", "buf_max", "buf_n", "pages"])


def tile_aggregate(ds: Dataset, cell_col: str, buffer_col: str = "best_buffer",
                   merge: str = "shuffle") -> Dataset:
    """Full two-stage tile aggregate: partial per batch, merged per
    cell, finalize mean. Output columns:
    (cell_col, pages, mean_buffer, min_buffer, max_buffer).

    ``merge="shuffle"`` scales to millions of cells (res-9 planet);
    ``merge="single"`` is the cheap plan when the cell count is known
    small (regional tiles, coarse resolutions) and sorts by cell.
    """
    return grouped_aggregate(
        ds, [cell_col],
        [(cell_col, "count", "pages"),
         (buffer_col, "mean", "mean_buffer"),
         (buffer_col, "min", "min_buffer"),
         (buffer_col, "max", "max_buffer")],
        merge=merge,
        sort_keys=[cell_col] if merge == "single" else None,
    )


def grouped_aggregate(ds: Dataset, keys: list[str],
                      specs: list[tuple[str, str, str]],
                      merge: str = "shuffle",
                      sort_keys: list[str] | None = None) -> Dataset:
    """Generic scalable grouped aggregation: per-batch partial combine
    (pyarrow C++ hash group-by) -> merge of partials -> finalize.
    ``specs`` entries are ``(column, op, out_name)`` with op in
    {"sum", "min", "max", "count", "count_rows", "mean"}.

    The partial stage carries one row per (batch, group) instead of one
    per input row — the same skew-collapsing property as
    :func:`tile_aggregate` (a hot key costs one partial row per batch).

    ``merge``:
      * ``"shuffle"`` — Ray groupby().aggregate over the partials: the
        right plan when the GROUP CARDINALITY is large (e.g. per-url
        dedup at 10^12 rows) since no single worker holds all groups.
      * ``"single"`` — route all partials to one task (repartition(1))
        and merge + finalize (+ optional sort) there in one pyarrow
        group_by. The right plan when groups are few (summary stats,
        per-segment rollups): the partials total n_blocks x n_groups
        tiny rows, and this skips two all-to-all operators (Aggregate +
        Sort), each with ~1-2s fixed cost per query.
    ``sort_keys`` (single merge only): sort the final table by these
    columns inside the merge task.
    """
    partial_aggs: list[tuple[str, str]] = []   # (col, pa_fn)
    partial_names: list[str] = []
    merge_aggs = []
    final_exprs: list[tuple[str, str, str | None]] = []  # out, kind, aux

    def add_partial(col, fn, name):
        partial_aggs.append((col, fn))
        partial_names.append(name)

    for col, op, out in specs:
        if op == "sum":
            add_partial(col, "sum", out)
            merge_aggs.append(Sum(out, alias_name=out))
            final_exprs.append((out, "direct", None))
        elif op == "min":
            add_partial(col, "min", out)
            merge_aggs.append(Min(out, alias_name=out))
            final_exprs.append((out, "direct", None))
        elif op == "max":
            add_partial(col, "max", out)
            merge_aggs.append(Max(out, alias_name=out))
            final_exprs.append((out, "direct", None))
        elif op == "count":
            add_partial(col, "count", out)
            merge_aggs.append(Sum(out, alias_name=out))
            final_exprs.append((out, "direct", None))
        elif op == "count_rows":
            add_partial(keys[0], "count", out)   # keys are non-null here
            merge_aggs.append(Sum(out, alias_name=out))
            final_exprs.append((out, "direct", None))
        elif op == "mean":
            add_partial(col, "sum", f"__{out}_s")
            add_partial(col, "count", f"__{out}_n")
            merge_aggs.append(Sum(f"__{out}_s", alias_name=f"__{out}_s"))
            merge_aggs.append(Sum(f"__{out}_n", alias_name=f"__{out}_n"))
            final_exprs.append((out, "mean", None))
        else:
            raise ValueError(f"unknown op {op}")

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate(partial_aggs)
        # pyarrow returns keys first, then aggregates in spec order
        return g.rename_columns(keys + partial_names)

    def finalize(b: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array | pa.ChunkedArray] = {k: b[k] for k in keys}
        for out, kind, _ in final_exprs:
            if kind == "direct":
                cols[out] = b[out]
            else:
                s = np.asarray(b[f"__{out}_s"].to_numpy(zero_copy_only=False),
                               dtype=np.float64)
                n = np.asarray(b[f"__{out}_n"].to_numpy(zero_copy_only=False),
                               dtype=np.float64)
                with np.errstate(invalid="ignore", divide="ignore"):
                    cols[out] = pa.array(
                        np.where(n > 0, s / np.maximum(n, 1), np.nan),
                        pa.float64(), from_pandas=True)
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    if merge == "single":
        # re-combine the partials with the same (sum/min/max of partial)
        # functions pyarrow-side in ONE task
        remerge_aggs = []
        for (col, fn), name in zip(partial_aggs, partial_names):
            refn = "sum" if fn in ("sum", "count") else fn
            remerge_aggs.append((name, refn))

        def merge_one(b: pa.Table) -> pa.Table:
            g = b.group_by(keys).aggregate(remerge_aggs)
            g = g.rename_columns(keys + partial_names)
            g = finalize(g)
            if sort_keys:
                g = g.sort_by([(k, "ascending") for k in sort_keys])
            return g

        return partials.repartition(1).map_batches(
            merge_one, batch_format="pyarrow", batch_size=None)

    merged = partials.groupby(keys[0] if len(keys) == 1 else keys) \
                     .aggregate(*merge_aggs)
    return merged.map_batches(finalize, batch_format="pyarrow")


def grouped_quantiles(ds: Dataset, group_col: str, value_col: str,
                      qs: list[float], out_names: list[str]) -> Dataset:
    """EXACT per-group discrete quantiles (DuckDB quantile_disc
    semantics: the sorted element at index ceil(q*n)-1).

    Runs as groupby().map_groups — one group's values must fit a worker
    (fine for per-category stats; for mega-groups switch to a mergeable
    histogram sketch and accept bin-width error).
    """

    def one_group(g: pa.Table) -> pa.Table:
        v = np.sort(np.asarray(g[value_col].to_numpy(zero_copy_only=False),
                               dtype=np.float64))
        n = len(v)
        cols = {group_col: pa.array([g[group_col][0].as_py()])}
        for q, name in zip(qs, out_names):
            idx = min(max(int(np.ceil(q * n)) - 1, 0), n - 1)
            cols[name] = pa.array([float(v[idx])], pa.float64())
        return pa.table(cols)

    return ds.groupby(group_col).map_groups(one_group, batch_format="pyarrow")


def salted_groupby_map_groups(ds: Dataset, key: str, partial_fn, final_fn,
                              num_salts: int = 16, batch_format: str = "pyarrow") -> Dataset:
    """Two-stage skew-resistant grouped computation.

    ``partial_fn(group_df) -> df`` runs per (key, salt) group;
    ``final_fn(group_df) -> df`` merges a key's partials. The salt is a
    deterministic hash of the row position within batch + key so hot
    keys split across ``num_salts`` groups.
    """

    def add_salt(b: pa.Table) -> pa.Table:
        h = np.arange(b.num_rows, dtype=np.int64)
        salt = (h % num_salts).astype(np.int64)
        return b.append_column("_salt", pa.array(salt, pa.int64()))

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    stage1 = salted.groupby([key, "_salt"]).map_groups(partial_fn, batch_format=batch_format)
    return stage1.groupby(key).map_groups(final_fn, batch_format=batch_format)


def pivot_counts(ds: Dataset, group_col: str, type_col: str,
                 categories: list[str], out_prefix: str = "n_",
                 merge: str = "single") -> Dataset:
    """PIVOT: one output row per ``group_col`` value with a count
    column per category of ``type_col`` (SQL: ``count(*) FILTER (WHERE
    type = c) AS n_c``). Unknown categories are dropped (SQL IN-list
    semantics).

    Vectorized per batch as 0/1 indicator columns summed by the same
    partial-combine plan as :func:`grouped_aggregate` — a hot group
    costs one partial row per batch, never a shuffle of raw rows.
    """
    import pyarrow.compute as pc

    def indicators(b: pa.Table) -> pa.Table:
        cols = {group_col: b[group_col]}
        for c in categories:
            cols[f"{out_prefix}{c}"] = pc.cast(
                pc.equal(b[type_col], pa.scalar(c)), pa.int64())
        return pa.table(cols)

    specs = [(f"{out_prefix}{c}", "sum", f"{out_prefix}{c}")
             for c in categories]
    return grouped_aggregate(ds.map_batches(indicators,
                                            batch_format="pyarrow"),
                             [group_col], specs, merge=merge,
                             sort_keys=[group_col]
                             if merge == "single" else None)


def grouping_sets_aggregate(ds: Dataset, keys: list[str],
                            specs: list[tuple[str, str, str]],
                            sets: list[list[str]],
                            sentinel: str = "ALL",
                            merge: str = "shuffle") -> Dataset:
    """GROUP BY GROUPING SETS: one output level per key subset in
    ``sets``, absent key columns holding ``sentinel`` (SQL mirrors with
    ``coalesce(k, sentinel)``). ROLLUP and CUBE are the prefix/powerset
    specializations below. Ops are re-aggregable only
    (sum/min/max/count/count_rows — mean must be derived from
    sum+count by the caller).

    Scale shape: ONE pass over the raw input builds the finest level
    (partial-combine, so input never shuffles raw rows); every coarser
    level re-aggregates the already-reduced fine table — the fine
    result is materialized ONCE and shared by all levels instead of
    re-scanning the input per level. Key columns must be strings (the
    sentinel needs a slot in the same type).
    """
    for _, op, _ in specs:
        if op not in ("sum", "min", "max", "count", "count_rows"):
            raise ValueError(f"cannot re-aggregate op {op!r}")
    out_names = [out for _, _, out in specs]

    fine = grouped_aggregate(ds, keys, specs, merge=merge).materialize()
    respec = [(out, "sum" if op in ("sum", "count", "count_rows")
               else op, out) for _, op, out in specs]

    def project(level_keys: list[str]):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {}
            for k in keys:
                cols[k] = (b[k] if k in level_keys
                           else pa.array([sentinel] * n, pa.string()))
            for o in out_names:
                cols[o] = b[o]
            return pa.table(cols)
        return f

    levels = []
    for sub in sets:
        sub = [k for k in keys if k in sub]  # canonical order
        if sub == keys:
            lvl = fine
        elif sub:
            lvl = grouped_aggregate(fine, sub, respec, merge="single")
        else:
            lvl = grouped_aggregate(
                fine.map_batches(
                    lambda b: b.append_column(
                        "_all", pa.array([0] * b.num_rows, pa.int64())),
                    batch_format="pyarrow"),
                ["_all"], respec, merge="single")
        levels.append(lvl.map_batches(project(sub), batch_format="pyarrow"))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def rollup_aggregate(ds: Dataset, keys: list[str],
                     specs: list[tuple[str, str, str]],
                     sentinel: str = "ALL",
                     merge: str = "shuffle") -> Dataset:
    """GROUP BY ROLLUP(keys...): fine level + one subtotal per key
    prefix + grand total (see :func:`grouping_sets_aggregate`)."""
    sets = [keys[:w] for w in range(len(keys), -1, -1)]
    return grouping_sets_aggregate(ds, keys, specs, sets,
                                   sentinel=sentinel, merge=merge)


def cube_aggregate(ds: Dataset, keys: list[str],
                   specs: list[tuple[str, str, str]],
                   sentinel: str = "ALL",
                   merge: str = "shuffle") -> Dataset:
    """GROUP BY CUBE(keys...): every key subset
    (see :func:`grouping_sets_aggregate`)."""
    import itertools

    sets = [list(c) for w in range(len(keys), -1, -1)
            for c in itertools.combinations(keys, w)]
    return grouping_sets_aggregate(ds, keys, specs, sets,
                                   sentinel=sentinel, merge=merge)


def global_topk(ds: Dataset, sort_col: str, tie_col: str, k: int) -> Dataset:
    """Global top-k rows by ``sort_col`` DESC (ties: ``tie_col`` ASC).

    Per-block partial top-k bounds what the single final merge sees to
    k x n_blocks rows — no all-to-all sort of the full table, and the
    final task's input is O(k x blocks) regardless of input size (the
    same shape as the reference's per-source top-N, query_funcs.py:376,
    lifted to a whole-corpus ranking)."""

    def take_top(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[(sort_col, "descending"),
                                            (tie_col, "ascending")])
        return b.take(idx[:k])

    partials = ds.map_batches(take_top, batch_format="pyarrow")
    return partials.repartition(1).map_batches(
        take_top, batch_format="pyarrow", batch_size=None)


def grouped_collect_distinct_sorted(ds: Dataset, key: str, val: str,
                                    out_name: str,
                                    sep: str = ",") -> Dataset:
    """collect_set + sorted string_agg per key: one row per key with
    its DISTINCT ``val`` strings joined by ``sep`` in lexicographic
    order. Per-batch distinct-pair combiner shrinks the shuffle to one
    row per (batch, key, val); the assembly runs under the coarse-
    bucket exchange (never one Python call per key) and builds the
    joined strings VECTORIZED — an Arrow ListArray from per-key offsets
    fed to the C++ ``binary_join`` kernel."""
    from batch_geocode_ray.stages.windows import _bucketed_groups
    from batch_geocode_ray.functions.hashing import splitmix64

    def distinct_pairs(b: pa.Table) -> pa.Table:
        return (b.select([key, val])
                .group_by([key, val]).aggregate([]))

    def bucket(b: pa.Table, nb: int) -> pa.Table:
        col = b[key]
        if pa.types.is_integer(col.type):
            k = np.asarray(col.to_numpy(zero_copy_only=False)) \
                .astype(np.uint64)
            h = splitmix64(k)
        else:
            from batch_geocode_ray.functions.hashing import (
                stable_hash64_array,
            )

            h = stable_hash64_array(
                col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                else col)
        return b.append_column(
            "_bucket", pa.array((h % np.uint64(nb)).astype(np.int64)))

    def assemble(g: pa.Table) -> pa.Table:
        t = g.select([key, val])
        t = t.take(pc.sort_indices(t, sort_keys=[(key, "ascending"),
                                                 (val, "ascending")]))
        ks = t[key].combine_chunks()  # any Arrow type; segments via equal
        vs = t[val].combine_chunks()
        n = len(ks)
        # drop duplicate (key, val) pairs that met here from different
        # batches' partials
        dup = np.zeros(n, dtype=bool)
        key_eq = (np.asarray(pc.equal(ks.slice(1), ks.slice(0, n - 1))
                             .to_numpy(zero_copy_only=False))
                  if n > 1 else np.zeros(0, dtype=bool))
        if n > 1:
            eq = np.asarray(pc.equal(vs.slice(1), vs.slice(0, n - 1))
                            .to_numpy(zero_copy_only=False))
            dup[1:] = key_eq & eq
        keep = ~dup
        ks, vs = ks.filter(pa.array(keep)), vs.filter(pa.array(keep))
        m = len(ks)
        starts = np.ones(m, dtype=bool)
        if m > 1:
            starts[1:] = ~np.asarray(
                pc.equal(ks.slice(1), ks.slice(0, m - 1))
                .to_numpy(zero_copy_only=False))
        offs = np.concatenate([np.nonzero(starts)[0], [m]])
        lst = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), vs)
        return pa.table({
            key: ks.take(pa.array(np.nonzero(starts)[0], pa.int64())),
            out_name: pc.binary_join(lst, sep),
        })

    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow")
    return _bucketed_groups(pairs, bucket, assemble)


def int_quantile_threshold(ds: Dataset, value_col: str, q: float) -> int:
    """EXACT global discrete quantile of an INTEGER column at corpus
    scale — the selection statistic behind "keep the top X% by score"
    curation (FineWeb-style length/quality gating).

    :func:`grouped_quantiles` routes one group's raw values to one
    worker — fine per-category, corpus-fatal for a single global group
    (10^12 rows of int64 = 8 TB in one task). This path is mergeable
    instead: per-batch value->count partials (pyarrow hash group-by)
    -> single-task merge -> driver cumulative scan over the DISTINCT
    values. Partitioning assumption: the SCORE'S CARDINALITY is
    bounded (doc lengths, integer quality scores — ~10^6 distinct),
    which is what makes the exact answer cheap; a continuous score
    needs the q44 quantile-sketch path and its error bound instead.

    Returns the sorted element at index ``ceil(q*n)-1`` (DuckDB
    ``quantile_disc`` semantics, same as :func:`grouped_quantiles`).
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"int_quantile_threshold: q={q} outside [0, 1]")
    counts = grouped_aggregate(
        ds.select_columns([value_col]), [value_col],
        [(value_col, "count", "_n")], merge="single",
        sort_keys=[value_col])
    vs, ns = [], []
    for b in counts.iter_batches(batch_format="pyarrow"):
        vs.append(np.asarray(b[value_col].to_numpy(zero_copy_only=False),
                             dtype=np.int64))
        ns.append(np.asarray(b["_n"].to_numpy(zero_copy_only=False),
                             dtype=np.int64))
    if not vs or not sum(len(v) for v in vs):
        raise ValueError("int_quantile_threshold: empty input")
    v = np.concatenate(vs)
    n = np.concatenate(ns)
    order = np.argsort(v, kind="stable")
    v, n = v[order], n[order]
    total = int(n.sum())
    rank = min(max(int(np.ceil(q * total)) - 1, 0), total - 1)
    cum = np.cumsum(n)
    return int(v[np.searchsorted(cum, rank + 1)])


def global_percent_rank(ds: Dataset, value_col: str,
                        out_col: str = "pct_rank") -> Dataset:
    """SQL ``percent_rank() OVER (ORDER BY value)`` at corpus scale —
    the rank-CDF normalization used to calibrate quality/length scores
    before thresholding. A naive plan is a global sort plus an ordered
    window (two all-to-alls over every row); this one is mergeable
    value->count partials (same shape as
    :func:`int_quantile_threshold` — the exchange carries one row per
    DISTINCT value, never the inputs), a driver-built
    value -> rows-strictly-below table over the bounded-cardinality
    integer score, ONE ``ray.put`` broadcast, and a zero-shuffle
    scoring pass (one searchsorted probe per batch).

    Tie semantics match SQL RANK: every row of a tied value shares
    ``pct = rows_strictly_below / (n - 1)`` (0.0 when n == 1). The
    division is the same two-integer float64 division DuckDB performs,
    so results are bit-identical. Nulls in ``value_col`` are rejected
    (SQL window functions ORDER nulls instead; callers filter first).
    """
    counts = grouped_aggregate(
        ds.select_columns([value_col]), [value_col],
        [(value_col, "count", "_n")], merge="single",
        sort_keys=[value_col])
    vs, ns = [], []
    for b in counts.iter_batches(batch_format="pyarrow"):
        col = b[value_col]
        if col.null_count:
            raise ValueError(
                f"global_percent_rank: null values in {value_col!r}; "
                "filter nulls first (SQL windows order them instead)")
        vs.append(np.asarray(col.to_numpy(zero_copy_only=False),
                             dtype=np.int64))
        ns.append(np.asarray(b["_n"].to_numpy(zero_copy_only=False),
                             dtype=np.int64))
    if not vs or not sum(len(v) for v in vs):
        raise ValueError("global_percent_rank: empty input")
    v = np.concatenate(vs)
    n = np.concatenate(ns)
    order = np.argsort(v, kind="stable")
    v, n = v[order], n[order]
    total = int(n.sum())
    below = np.concatenate([[0], np.cumsum(n)[:-1]])
    pct = (below / float(total - 1) if total > 1
           else np.zeros(len(v), dtype=np.float64))
    ref = ray.put((v, pct))

    def score(b: pa.Table) -> pa.Table:
        v_sorted, p = ray.get(ref)  # plasma-cached after first fetch
        x = np.asarray(b[value_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        idx = np.searchsorted(v_sorted, x)  # exact: every value is in v
        return b.append_column(out_col, pa.array(p[idx], pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


def grouped_quantile_cont(ds: Dataset, keys: list[str], value_col: str,
                          qs: list[float],
                          out_names: list[str] | None = None) -> Dataset:
    """Per-group INTERPOLATED quantiles (SQL ``quantile_cont`` /
    ``percentile_cont``) of an integer column, from the same mergeable
    value->count partials as :func:`int_quantile_threshold` — the
    exchange carries one row per DISTINCT (group, value) pair, never
    the input rows. Same partitioning assumption: the score's
    cardinality is bounded (doc lengths, integer quality scores,
    ~10^6 distinct), which keeps the merged count table small even at
    10^12 input rows; a continuous score needs the quantile-sketch
    path (q44) and its error bound instead.

    Semantics match DuckDB/Postgres ``percentile_cont``: for a group
    of n values sorted ascending, the q-quantile sits at
    ``h = q * (n - 1)`` and interpolates linearly between the
    floor(h)-th and ceil(h)-th values. Prefer binary-exact q (0.25,
    0.5, 0.75): h is then IEEE-identical across engines, so
    floor/ceil cannot disagree when h lands on an integer. Nulls in
    ``value_col`` are ignored (SQL aggregate semantics); group keys
    are assumed non-null (the house-wide exchange convention — the
    segment boundary scan treats null-vs-null as a boundary).
    """
    if not qs:
        raise ValueError("grouped_quantile_cont: no quantiles requested")
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"grouped_quantile_cont: q={q} outside [0, 1]")
    if out_names is None:
        out_names = [f"p{int(round(q * 100)):02d}" for q in qs]
    if len(out_names) != len(qs):
        raise ValueError(
            "grouped_quantile_cont: out_names/qs length mismatch")

    def drop_null(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(b[value_col]))

    counts = grouped_aggregate(
        ds.select_columns(keys + [value_col])
          .map_batches(drop_null, batch_format="pyarrow"),
        keys + [value_col], [(value_col, "count", "_n")],
        merge="single", sort_keys=keys + [value_col])

    def finalize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            out = {k: b[k] for k in keys}
            for nm in out_names:
                out[nm] = pa.array([], pa.float64())
            return pa.table(out)
        # merge="single" delivers ONE block sorted by keys + value:
        # group segments are contiguous, values ascending within each.
        n_rows = b.num_rows
        change = np.zeros(n_rows, dtype=bool)
        change[0] = True
        if n_rows > 1:
            for k in keys:
                col = b[k].combine_chunks()
                change[1:] |= ~np.asarray(
                    pc.equal(col.slice(1), col.slice(0, n_rows - 1))
                    .to_numpy(zero_copy_only=False))
        starts = np.nonzero(change)[0]
        ends = np.concatenate([starts[1:], [n_rows]])
        v = np.asarray(b[value_col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        c = np.asarray(b["_n"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        res = np.empty((len(starts), len(qs)), dtype=np.float64)
        for gi, (s, e) in enumerate(zip(starts, ends)):  # per GROUP —
            # bounded group count by the module's grouping contract;
            # work within is vectorized over the distinct values
            cum = np.cumsum(c[s:e])
            total = int(cum[-1])
            for qi, q in enumerate(qs):
                h = q * (total - 1)
                lo = int(np.floor(h))
                hi = int(np.ceil(h))
                vlo = v[s + int(np.searchsorted(cum, lo + 1))]
                vhi = v[s + int(np.searchsorted(cum, hi + 1))]
                res[gi, qi] = vlo + (h - lo) * (vhi - vlo)
        out = {k: b[k].take(pa.array(starts, pa.int64())) for k in keys}
        for qi, nm in enumerate(out_names):
            out[nm] = pa.array(res[:, qi], pa.float64())
        return pa.table(out)

    return counts.map_batches(finalize, batch_format="pyarrow",
                              batch_size=None)


def grouped_bivariate_stats(ds: Dataset, keys: list[str],
                            x_col: str, y_col: str,
                            merge: str = "single",
                            sort_keys: list[str] | None = None) -> Dataset:
    """Per-group bivariate statistics — covariance, Pearson
    correlation, and the simple least-squares fit of y on x
    (``covar_yx``, ``corr_yx``, ``slope``, ``intercept``, plus
    ``n_rows``) — the "does quality track length per language?"
    analysis family (DuckDB's ``covar_pop``/``corr``/``regr_*``).

    Scalable shape: one streaming pass widens each batch with the
    moment columns (x, y, xy, x^2, y^2) and :func:`grouped_aggregate`
    reduces them — the exchange carries ~n_groups x n_blocks rows of
    six float64 moments, never the inputs. The finalize derives the
    statistics from the merged moments; zero-variance groups yield
    NULL slope/intercept/corr (DuckDB's semantics). Raw-moment
    formulas lose precision when |mean| >> stddev — acceptable at the
    4-decimal parity grain both engines round to; a Welford/pairwise
    merge is the fix if a caller ever needs full precision.
    """
    xt, yt = "__bx", "__by"

    def widen(b: pa.Table) -> pa.Table:
        x = pc.cast(b[x_col], pa.float64())
        y = pc.cast(b[y_col], pa.float64())
        cols = {k: b[k] for k in keys}
        cols[xt] = x
        cols[yt] = y
        cols["__bxy"] = pc.multiply(x, y)
        cols["__bxx"] = pc.multiply(x, x)
        cols["__byy"] = pc.multiply(y, y)
        return pa.table(cols)

    base = grouped_aggregate(
        ds.map_batches(widen, batch_format="pyarrow"), keys,
        [(xt, "sum", "_sx"), (yt, "sum", "_sy"),
         ("__bxy", "sum", "_sxy"), ("__bxx", "sum", "_sxx"),
         ("__byy", "sum", "_syy"), (xt, "count", "n_rows")],
        merge=merge, sort_keys=sort_keys)

    def finalize(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n_rows"].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        sx = np.asarray(b["_sx"].to_numpy(zero_copy_only=False))
        sy = np.asarray(b["_sy"].to_numpy(zero_copy_only=False))
        sxy = np.asarray(b["_sxy"].to_numpy(zero_copy_only=False))
        sxx = np.asarray(b["_sxx"].to_numpy(zero_copy_only=False))
        syy = np.asarray(b["_syy"].to_numpy(zero_copy_only=False))
        with np.errstate(invalid="ignore", divide="ignore"):
            mx, my = sx / n, sy / n
            cov = sxy / n - mx * my
            vx = sxx / n - mx * mx
            vy = syy / n - my * my
            slope = np.where(vx > 0, cov / np.where(vx > 0, vx, 1.0),
                             np.nan)
            intercept = np.where(vx > 0, my - slope * mx, np.nan)
            sd = np.sqrt(np.where(vx > 0, vx, np.nan)
                         * np.where(vy > 0, vy, np.nan))
            corr = np.where((vx > 0) & (vy > 0),
                            cov / np.where(sd > 0, sd, 1.0), np.nan)
        cols = {k: b[k] for k in keys}
        cols["n_rows"] = pc.cast(b["n_rows"], pa.int64())
        for name, arr in [("covar_yx", cov), ("corr_yx", corr),
                          ("slope", slope), ("intercept", intercept)]:
            cols[name] = pa.array(arr, pa.float64(), from_pandas=True)
        return pa.table(cols)

    return base.map_batches(finalize, batch_format="pyarrow")
