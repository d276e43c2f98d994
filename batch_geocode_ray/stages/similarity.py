"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is ``ray.put``
ONCE and every batch does one float64 matmul against it; per-batch
partial top-k keeps only k rows per (query, block) so the shuffle to
the final per-query merge is tiny.

Scale path: IVF — deterministic k-means centroids from a sample, vectors
bucketed by nearest centroid, queries probe the ``nprobe`` nearest
buckets only. Approximate by design; the baseline is the oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


def _matrix_of(batch: pa.Table, vec_col: str) -> np.ndarray:
    """(n, d) float64 matrix from a fixed-size/variable list column."""
    col = batch[vec_col].combine_chunks()
    flat = np.asarray(col.flatten().to_numpy(zero_copy_only=False),
                      dtype=np.float64)
    n = batch.num_rows
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.sqrt((m * m).sum(axis=1, keepdims=True))
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(norms > 0, m / norms, 0.0)


def _partial_topk_ties(s: np.ndarray, cand_ids: np.ndarray, kk: int):
    """Indices of the kk best (sim desc, id asc) candidates — tie-aware.

    Plain ``argpartition(-s, kk-1)[:kk]`` can drop the smaller-id member
    of a similarity tie at the block's cutoff, diverging from the
    documented (sim DESC, id ASC) ordering once blocks merge. Keep every
    candidate at or above the partition threshold, then lexsort only
    that (small) slice."""
    part = np.argpartition(-s, kk - 1)[:kk]
    thresh = s[part].min()
    at_or_above = np.nonzero(s >= thresh)[0]
    s2, ids2 = s[at_or_above], cand_ids[at_or_above]
    sel = np.lexsort((ids2, -s2))[:kk]
    return at_or_above[sel]


def knn_cosine(ds: Dataset, vec_col: str, id_col: str,
               queries: np.ndarray, query_ids: np.ndarray,
               k: int = 5, exclude_self: bool = True) -> Dataset:
    """Exact cosine top-k of every query against the whole dataset.

    Per batch: one (B x Q) float64 matmul + argpartition partial top-k
    -> shuffle carries k rows per (query, block) -> groupby(query_id)
    final merge. Ties break on smaller neighbor id (deterministic).
    Output: (query_id, neighbor_id, rank) with rank 1..k.
    """
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((qm, np.asarray(query_ids, dtype=np.int64)))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qmat, qids = ray.get(q_ref)
        m = _normalize(_matrix_of(batch, vec_col))
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        sims = m @ qmat.T  # (B, Q)
        out_q, out_n, out_s = [], [], []
        for qi in range(qmat.shape[0]):
            s = sims[:, qi]
            cand_ids = ids
            if exclude_self:
                mask = ids != qids[qi]
                s, cand_ids = s[mask], ids[mask]
            kk = min(k, len(cand_ids))
            if kk == 0:
                continue
            part = _partial_topk_ties(s, cand_ids, kk)
            out_q.append(np.full(kk, qids[qi], dtype=np.int64))
            out_n.append(cand_ids[part])
            out_s.append(s[part])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64()),
        })

    return _merge_partial_topk(
        ds.map_batches(partial_topk, batch_format="pyarrow"), k,
        n_queries=qm.shape[0])


# Above this many queries, the partials (k x Q x n_blocks rows) stop
# being "tiny" and the single-task merge would concentrate them on one
# worker — switch to the bucketed shuffle merge instead.
SHUFFLE_MERGE_QUERIES = 10_000


def _merge_partial_topk(partials: Dataset, k: int,
                        n_queries: int | None = None) -> Dataset:
    """Final per-query top-k over the partials.

    Small query sets (the common broadcast-kNN case): ONE task — the
    partials total k x Q x n_blocks tiny rows, so a groupby(query_id)
    all-to-all (~1-2s fixed) is pure overhead; route them to a single
    task and segment with a lexsort. Output ordered (query_id, rank),
    the oracle order.

    Large query sets (Q > SHUFFLE_MERGE_QUERIES, e.g. per-doc queries):
    coarse-bucket by query_id hash (size-probed bucket count,
    ~32 MB/bucket) and merge per bucket in parallel (never one task per
    query — see grouped-aggregate notes), then a distributed sort
    restores the (query_id, rank) order. No single worker ever holds
    more than one bucket of the partials."""

    def merge_one(b: pa.Table) -> pa.Table:
        q = np.asarray(b["query_id"].to_numpy(zero_copy_only=False),
                       np.int64)
        nid = np.asarray(b["neighbor_id"].to_numpy(zero_copy_only=False),
                         np.int64)
        s = np.asarray(b["sim"].to_numpy(zero_copy_only=False))
        order = np.lexsort((nid, -s, q))
        q, nid = q[order], nid[order]
        new_q = np.ones(len(q), dtype=bool)
        new_q[1:] = q[1:] != q[:-1]
        start = np.maximum.accumulate(np.where(new_q, np.arange(len(q)), 0))
        rank = np.arange(len(q)) - start + 1
        keep = rank <= k
        return pa.table({
            "query_id": pa.array(q[keep], pa.int64()),
            "neighbor_id": pa.array(nid[keep], pa.int64()),
            "rank": pa.array(rank[keep], pa.int64()),
        })

    if n_queries is not None and n_queries > SHUFFLE_MERGE_QUERIES:
        from batch_geocode_ray.stages.dedup import adaptive_bucket_count

        partials = partials.materialize()  # k-bounded rows per group
        n_buckets = adaptive_bucket_count(partials.size_bytes() or 0)

        def add_bucket(b: pa.Table) -> pa.Table:
            q = np.asarray(b["query_id"].to_numpy(zero_copy_only=False),
                           np.int64)
            return b.append_column(
                "_qb", pa.array((q % n_buckets).astype(np.int64)))

        def merge_bucket(g: pa.Table) -> pa.Table:
            return merge_one(g.drop_columns(["_qb"]))

        return (partials.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("_qb")
                .map_groups(merge_bucket, batch_format="pyarrow")
                .sort(["query_id", "rank"]))

    return partials.repartition(1).map_batches(
        merge_one, batch_format="pyarrow", batch_size=None)


def _pair_table(d1, d2, cos) -> pa.Table:
    return pa.table({
        "d1": pa.array(d1, pa.int64()),
        "d2": pa.array(d2, pa.int64()),
        "cosine": pa.array(cos, pa.float64()),
    })


def _upper_pairs(ids_a, m_a, ids_b, m_b, threshold) -> pa.Table:
    """Above-threshold (a < b) cosine pairs between two id/vector sets
    (inputs pre-normalized)."""
    if len(ids_a) == 0 or len(ids_b) == 0:
        return _pair_table([], [], [])
    sims = m_a @ m_b.T
    keep = (sims >= threshold) & (ids_a[:, None] < ids_b[None, :])
    r, c = np.nonzero(keep)
    return _pair_table(ids_a[r], ids_b[c], sims[r, c])


@ray.remote
def _block_pair_sims(t1: pa.Table, t2: pa.Table | None, vec_col: str,
                     id_col: str, threshold: float) -> pa.Table:
    """One exact block-vs-block similarity tile (t2 None = t1 vs t1)."""
    ids1 = np.asarray(t1[id_col].to_numpy(zero_copy_only=False), np.int64)
    m1 = _normalize(_matrix_of(t1, vec_col))
    if t2 is None:
        return _upper_pairs(ids1, m1, ids1, m1, threshold)
    ids2 = np.asarray(t2[id_col].to_numpy(zero_copy_only=False), np.int64)
    m2 = _normalize(_matrix_of(t2, vec_col))
    return _upper_pairs(ids1, m1, ids2, m2, threshold)


def cosine_neardup_pairs(ds: Dataset, vec_col: str, id_col: str,
                         threshold: float = 0.4,
                         method: str = "exact",
                         bands: int = 16, rows: int = 8,
                         seed: int = 23,
                         size_hint_bytes: int | None = None) -> Dataset:
    """All (a < b) vector pairs with cosine >= threshold.
    Output: (d1, d2, cosine).

    Physical plans (nothing O(N) ever concentrates on the driver):
      * small input (the (id, vec) projection measures under the dedup
        small-collapse threshold) -> the whole exact join runs in ONE
        task.
      * ``method="exact"`` at scale -> block-pair tiling: the dataset's
        blocks stay in the object store (the projection MUST
        materialize here — the triangular tiling addresses blocks by
        ref); one Ray task per block pair (i <= j) fetches exactly two
        blocks and emits its above-threshold pairs. Exact at ANY
        threshold; the quadratic compute is inherent to an exact
        similarity join (raw tasks used because a triangular self-join
        has no Dataset-API shape).
      * ``method="lsh"`` -> random-hyperplane LSH: sign bits of
        ``bands*rows`` fixed projections, banded into ``bands`` bucket
        keys; within-bucket exact cosine verify, then a pair-distinct
        groupby. Linear shuffle, no false positives; recall follows the
        banding S-curve — right for true near-dup thresholds (>= ~0.7;
        at 0.4 the hyperplane collision rate barely prunes, use exact).
        The LSH path STREAMS: it needs one ``take_batch(1)`` for the
        vector dim, never the whole projection — pass
        ``size_hint_bytes`` (~vec bytes x rows) and the (id, vec)
        projection is never pinned in the object store (at 10^9
        embeddings x 1 KB the old unconditional materialize pinned
        ~1 TB the plan didn't need).
    """
    from batch_geocode_ray.stages import dedup as _dd  # shared knob

    if method == "lsh":
        proj, small, probed_bytes = _dd._probe_small(
            ds.select_columns([id_col, vec_col]),
            size_hint_bytes=size_hint_bytes)
    else:
        # block-pair tiling is ref-addressed: materialization inherent
        proj = ds.select_columns([id_col, vec_col]).materialize()
        probed_bytes = proj.size_bytes() or 0
        small = probed_bytes < _dd.SMALL_COLLAPSE_BYTES

    if small and method != "lsh":
        def one(b: pa.Table) -> pa.Table:
            ids = np.asarray(b[id_col].to_numpy(zero_copy_only=False),
                             np.int64)
            m = _normalize(_matrix_of(b, vec_col))
            out = _upper_pairs(ids, m, ids, m, threshold)
            return out.sort_by([("d1", "ascending"), ("d2", "ascending")])

        return proj.repartition(1).map_batches(
            one, batch_format="pyarrow", batch_size=None)

    if method == "exact":
        refs = proj.to_arrow_refs()  # O(blocks) refs; data stays put
        tiles = []
        for i in range(len(refs)):
            tiles.append(_block_pair_sims.remote(
                refs[i], None, vec_col, id_col, threshold))
            for j in range(i + 1, len(refs)):
                tiles.append(_block_pair_sims.remote(
                    refs[i], refs[j], vec_col, id_col, threshold))
        import ray.data as rd
        return rd.from_arrow_refs(tiles)

    # ---- LSH plan (streams: only one batch is ever pulled eagerly) ----
    n_planes = bands * rows
    first = proj.take_batch(1, batch_format="pyarrow")
    dim = _matrix_of(first, vec_col).shape[1]
    planes = np.random.RandomState(seed).randn(n_planes, dim)
    planes_ref = ray.put(planes)
    from batch_geocode_ray.stages.dedup import adaptive_bucket_count

    # exchange carries `bands` copies of each (id, vec) row
    n_buckets = adaptive_bucket_count(bands * probed_bytes)

    def band_rows(b: pa.Table) -> pa.Table:
        from batch_geocode_ray.functions.hashing import splitmix64
        pl = ray.get(planes_ref)
        m = _normalize(_matrix_of(b, vec_col))
        ids = np.asarray(b[id_col].to_numpy(zero_copy_only=False), np.int64)
        n = len(ids)
        if n == 0:
            return pa.table({"bkey": pa.array([], pa.int64()),
                             "_bucket": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             vec_col: b[vec_col]})
        bits = (m @ pl.T) >= 0.0                      # (n, planes)
        weights = (np.uint64(1) << np.arange(rows, dtype=np.uint64))
        keys = []
        bnds = []
        for band in range(bands):
            block = bits[:, band * rows:(band + 1) * rows].astype(np.uint64)
            keys.append(block @ weights)
            bnds.append(np.full(n, band, dtype=np.int64))
        combined = (np.concatenate(keys).astype(np.uint64)
                    ^ splitmix64(np.concatenate(bnds)))
        vec = b[vec_col].combine_chunks()
        idx = pa.array(np.tile(np.arange(n), bands), pa.int64())
        return pa.table({
            "bkey": pa.array(combined.astype(np.int64), pa.int64()),
            "_bucket": pa.array(
                (combined % np.uint64(n_buckets)).astype(np.int64)),
            id_col: pa.array(np.tile(ids, bands), pa.int64()),
            vec_col: vec.take(idx),
        })

    def verify_bucket(group: pa.Table) -> pa.Table:
        bk = np.asarray(group["bkey"].to_numpy(zero_copy_only=False), np.int64)
        ids = np.asarray(group[id_col].to_numpy(zero_copy_only=False), np.int64)
        m = _normalize(_matrix_of(group, vec_col))
        order = np.lexsort((ids, bk))
        bk, ids, m = bk[order], ids[order], m[order]
        bounds = np.concatenate([[0], np.nonzero(np.diff(bk))[0] + 1, [len(bk)]])
        outs = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            seg_ids, first_idx = np.unique(ids[s:e], return_index=True)
            if len(seg_ids) < 2:
                continue
            seg_m = m[s:e][first_idx]
            outs.append(_upper_pairs(seg_ids, seg_m, seg_ids, seg_m, threshold))
        if not outs:
            return _pair_table([], [], [])
        return pa.concat_tables(outs)

    pairs = (proj.map_batches(band_rows, batch_format="pyarrow")
             .groupby("_bucket")
             .map_groups(verify_bucket, batch_format="pyarrow"))
    # same pair can surface from several bands -> distinct via groupby
    from ray.data.aggregate import Max
    return pairs.groupby(["d1", "d2"]).aggregate(
        Max("cosine", alias_name="cosine"))


def _nearest_centroid(m: np.ndarray, c: np.ndarray) -> np.ndarray:
    """argmin_j ||x - c_j||^2, candidate-select-then-exact-refine (the
    kNN chord-then-haversine pattern): the BLAS form (-2 x·cT +
    ||c||^2; the x-norm term is constant per row) ranks in O(batch x k)
    memory instead of the O(batch x k x d) broadcast tensor — the
    difference between k=8 and the SemDeDup-scale k~50k both working —
    but its cancellation error (~|x||c|·eps) can flip near-equidistant
    assignments vs the exact difference form, so the top-2 BLAS
    candidates are re-scored exactly (O(batch x 2 x d)) and exact ties
    keep the lower index, matching the naive oracle."""
    k = c.shape[0]
    if k == 1:
        return np.zeros(m.shape[0], dtype=np.int64)
    d2 = -2.0 * (m @ c.T) + (c * c).sum(axis=1)[None, :]
    cand = np.argpartition(d2, 1, axis=1)[:, :2]
    diff0 = m - c[cand[:, 0]]
    diff1 = m - c[cand[:, 1]]
    e0 = (diff0 * diff0).sum(axis=1)
    e1 = (diff1 * diff1).sum(axis=1)
    take1 = (e1 < e0) | ((e1 == e0) & (cand[:, 1] < cand[:, 0]))
    return np.where(take1, cand[:, 1], cand[:, 0]).astype(np.int64)


def kmeans_fit(ds: Dataset, vec_col: str, k: int = 8, iters: int = 10,
               seed: int = 11, sample_size: int = 2048) -> np.ndarray:
    """Distributed Lloyd's k-means over an embedding column.

    Init: deterministic sample -> local k-means (cheap, seeds quality).
    Each iteration: broadcast centroids, every batch computes assignments
    and PARTIAL per-cluster (sum, count); the driver merges k x d
    numbers and updates. The full dataset streams once per iteration;
    nothing big ever concentrates. Returns (k, d) float64 centroids.
    """
    sample_t = pa.concat_tables(
        [ray.get(r) for r in
         ds.select_columns([vec_col]).limit(sample_size).to_arrow_refs()])
    cent = _kmeans(_matrix_of(sample_t, vec_col), k, seed=seed)

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _matrix_of(batch, vec_col)
            if m.shape[0] == 0:
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "vsum": pa.array([], pa.list_(pa.float64())),
                                 "n": pa.array([], pa.int64())})
            assign = _nearest_centroid(m, c)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=len(c))
            live = counts > 0
            return pa.table({
                "cluster": pa.array(np.nonzero(live)[0], pa.int64()),
                "vsum": pa.array(list(sums[live]), pa.list_(pa.float64())),
                "n": pa.array(counts[live], pa.int64()),
            })

        parts = pa.concat_tables(
            [ray.get(r) for r in
             ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()])
        new_cent = cent.copy()
        cl = np.asarray(parts["cluster"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        ns = np.asarray(parts["n"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        vs = np.asarray(parts["vsum"].combine_chunks().flatten()
                        .to_numpy(zero_copy_only=False)).reshape(len(cl), -1)
        tot_n = np.zeros(len(cent), dtype=np.int64)
        tot_s = np.zeros_like(cent)
        np.add.at(tot_n, cl, ns)
        np.add.at(tot_s, cl, vs)
        live = tot_n > 0
        new_cent[live] = tot_s[live] / tot_n[live, None]
        if np.allclose(new_cent, cent, atol=1e-12):
            cent = new_cent
            break
        cent = new_cent
    return cent


def kmeans_assign(ds: Dataset, vec_col: str, id_col: str,
                  centroids: np.ndarray) -> Dataset:
    """Append each vector's nearest-centroid ``cluster`` (int64)."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def f(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _matrix_of(batch, vec_col)
        if m.shape[0] == 0:
            return pa.table({id_col: batch[id_col],
                             "cluster": pa.array([], pa.int64())})
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(_nearest_centroid(m, c)),
        })

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF (scale path, approximate)
# ---------------------------------------------------------------------------

def _kmeans(sample: np.ndarray, n_clusters: int, iters: int = 10,
            seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)),
                     replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def ivf_knn(ds: Dataset, vec_col: str, id_col: str,
            queries: np.ndarray, query_ids: np.ndarray,
            k: int = 5, n_clusters: int = 16, nprobe: int = 4,
            sample_size: int = 2048, exclude_self: bool = True) -> Dataset:
    """Approximate top-k: vectors are assigned to their nearest k-means
    centroid in one pass; each query searches only its ``nprobe``
    nearest clusters. Same output schema as :func:`knn_cosine` —
    approximate where cluster boundaries cut true neighborhoods."""
    sample_t = pa.concat_tables(
        [ray.get(r) for r in
         ds.select_columns([vec_col]).limit(sample_size).to_arrow_refs()])
    cent = _normalize(_kmeans(_normalize(_matrix_of(sample_t, vec_col)),
                              n_clusters))
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    q_assign = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    ref = ray.put((cent, qm, np.asarray(query_ids, dtype=np.int64), q_assign))

    def partial(batch: pa.Table) -> pa.Table:
        cent_, qmat, qids, probes = ray.get(ref)
        m = _normalize(_matrix_of(batch, vec_col))
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        v_assign = (m @ cent_.T).argmax(axis=1)
        out_q, out_n, out_s = [], [], []
        for qi in range(qmat.shape[0]):
            in_probe = np.isin(v_assign, probes[qi])
            if exclude_self:
                in_probe &= ids != qids[qi]
            if not in_probe.any():
                continue
            s = m[in_probe] @ qmat[qi]
            cand = ids[in_probe]
            kk = min(k, len(cand))
            part = _partial_topk_ties(s, cand, kk)
            out_q.append(np.full(kk, qids[qi], dtype=np.int64))
            out_n.append(cand[part])
            out_s.append(s[part])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64()),
        })

    return _merge_partial_topk(
        ds.map_batches(partial, batch_format="pyarrow"), k,
        n_queries=qm.shape[0])


def pca_project(ds: Dataset, vec_col: str, id_col: str,
                k: int = 2) -> Dataset:
    """Distributed PCA projection — the train-tiny-globally /
    apply-everywhere pattern: every block contributes one mergeable
    (n, sum_vec, X^T X) partial (d + d^2 floats, BLAS), the driver
    eigendecomposes the resulting d x d covariance (trivially small at
    any corpus size), and the top-``k`` components broadcast back for a
    per-batch projection matmul. Nothing corpus-sized ever leaves the
    blocks; the all-reduce payload is blocks x d^2 floats.

    Deterministic: partials are merged in sorted-bytes order (float
    summation order fixed across runs/schedulers) and each component's
    sign is fixed by making its largest-|coordinate| positive.

    Output: (``id_col``, pc1..pck) float64, one row per vector.
    """

    def partial(b: pa.Table) -> pa.Table:
        x = _matrix_of(b, vec_col)
        if x.shape[0] == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.binary()),
                             "g": pa.array([], pa.binary())})
        return pa.table({
            "n": pa.array([x.shape[0]], pa.int64()),
            "s": pa.array([x.sum(axis=0).tobytes()], pa.binary()),
            "g": pa.array([(x.T @ x).tobytes()], pa.binary()),
        })

    def merge_one(t: pa.Table) -> pa.Table:
        # ONE task sums all block partials (deterministic: sorted-bytes
        # order fixes float association across runs/schedulers); the
        # driver then fetches a single (d + d^2)-float blob instead of
        # blocks x d^2 — the assumption is d^2 x 8 B fits a task
        # (d <= ~2000), the same bound q65's Gram merge documents
        if t.num_rows == 0:
            # explicit zero partial: np.sum([], axis=0) is a scalar and
            # would die opaquely here; hand the driver n=0 so its
            # "pca_project: empty input" ValueError fires as designed
            return pa.table({"n": pa.array([0], pa.int64()),
                             "s": pa.array([b""], pa.binary()),
                             "g": pa.array([b""], pa.binary())})
        rows = sorted((t["n"][i].as_py(), t["s"][i].as_py(),
                       t["g"][i].as_py()) for i in range(t.num_rows))
        n_tot = sum(r[0] for r in rows)
        s = np.sum([np.frombuffer(r[1], np.float64) for r in rows],
                   axis=0)
        dd = len(s)
        g = np.sum([np.frombuffer(r[2], np.float64).reshape(dd, dd)
                    for r in rows], axis=0)
        return pa.table({"n": pa.array([n_tot], pa.int64()),
                         "s": pa.array([s.tobytes()], pa.binary()),
                         "g": pa.array([g.tobytes()], pa.binary())})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .repartition(1)
              .map_batches(merge_one, batch_format="pyarrow",
                           batch_size=None).take_all())
    if not merged or merged[0]["n"] == 0:
        raise ValueError("pca_project: empty input")
    n_total = merged[0]["n"]
    s = np.frombuffer(merged[0]["s"], np.float64)
    d = len(s)
    g = np.frombuffer(merged[0]["g"], np.float64).reshape(d, d)
    mean = s / n_total
    cov = g / n_total - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)          # ascending eigenvalues
    comps = v[:, ::-1][:, :k]           # top-k columns
    flip = comps[np.abs(comps).argmax(axis=0), np.arange(k)] < 0
    comps = comps * np.where(flip, -1.0, 1.0)
    mean_ref = ray.put(mean)
    comps_ref = ray.put(comps)

    def project(b: pa.Table) -> pa.Table:
        m = ray.get(mean_ref)
        c = ray.get(comps_ref)
        x = _matrix_of(b, vec_col)
        p = (x - m) @ c if x.shape[0] else np.zeros((0, k))
        out = {id_col: b[id_col]}
        for j in range(k):
            out[f"pc{j + 1}"] = pa.array(p[:, j], pa.float64())
        return pa.table(out)

    return ds.map_batches(project, batch_format="pyarrow")


def semantic_dedup(ds: Dataset, vec_col: str, id_col: str,
                   threshold: float = 0.9,
                   centroids: np.ndarray | None = None,
                   k: int = 8, kmeans_iters: int = 10, seed: int = 11,
                   n_buckets: int | None = None,
                   size_hint_bytes: int | None = None) -> Dataset:
    """SemDeDup-class semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with k-means, then
    WITHIN each cluster flag every item whose cosine similarity to an
    item ranked earlier in the cluster's canonical order reaches
    ``threshold``. The canonical order is (cosine-to-centroid ASC,
    id ASC), so the kept representative of each duplicate chain is the
    member FARTHEST from its centroid — the paper's "keep hard
    examples" rule — and the whole pass is deterministic.

    Distributed shape (the paper's reason for clustering first): the
    O(n^2) pairwise matmul is confined to within-cluster blocks. One
    narrow assign pass appends (cluster, centroid_sim) and packs the
    NORMALIZED vector into a fixed-width binary blob (list<float>
    cannot ride an exchange — see the MinHash verify note); then ONE
    coarse-bucket exchange keyed on cluster delivers whole clusters to
    tasks that lexsort, segment, and matmul per cluster. Below the
    small threshold (or under a small ``size_hint_bytes``) the exchange
    collapses to one task; above it the plan streams — pass
    ``size_hint_bytes`` (input bytes) to skip the size probe entirely.

    Partitioning assumption (document per the paper: k is chosen so
    clusters average ~n/k items): ONE CLUSTER's members fit one task's
    memory. At corpus scale pick k proportional to n (SemDeDup uses
    50k clusters for LAION-440M); skewed giant clusters would need the
    same salting treatment as connected components — out of scope here
    because k-means clusters are size-bounded by construction far more
    tightly than similarity components.

    Output: one row per input — (id_col, cluster, centroid_sim, kept).
    """
    from batch_geocode_ray.stages.windows import _bucketed_groups
    from batch_geocode_ray.functions.hashing import splitmix64

    if centroids is None:
        centroids = kmeans_fit(ds, vec_col, k=k, iters=kmeans_iters,
                               seed=seed)
    cn = _normalize(np.asarray(centroids, dtype=np.float64))
    cref = ray.put(cn)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mn = _normalize(_matrix_of(b, vec_col))
        n = b.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "centroid_sim": pa.array([], pa.float64()),
                             "_vec": pa.array([], pa.large_binary())})
        sims = mn @ c.T
        cl = sims.argmax(axis=1).astype(np.int64)
        cs = sims[np.arange(n), cl]
        width = mn.shape[1] * 8
        offsets = (np.arange(n + 1, dtype=np.int64) * width)
        vec_arr = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(np.ascontiguousarray(mn).tobytes())])
        return pa.table({id_col: b[id_col].combine_chunks().cast(pa.int64()),
                         "cluster": pa.array(cl),
                         "centroid_sim": pa.array(cs, pa.float64()),
                         "_vec": vec_arr})

    def bucket(b: pa.Table, nb: int) -> pa.Table:
        cl = np.asarray(b["cluster"].to_numpy(zero_copy_only=False),
                        dtype=np.uint64)
        return b.append_column(
            "_bucket",
            pa.array((splitmix64(cl) % np.uint64(nb)).astype(np.int64)))

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "cluster": pa.array([], pa.int64()),
                      "centroid_sim": pa.array([], pa.float64()),
                      "kept": pa.array([], pa.bool_())})

    def dedup_in_bucket(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return empty
        ids = np.asarray(g[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        cl = np.asarray(g["cluster"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        cs = np.asarray(g["centroid_sim"].to_numpy(zero_copy_only=False),
                        dtype=np.float64)
        vcol = g["_vec"].combine_chunks().cast(pa.large_binary())
        bufs = vcol.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int64)[
            vcol.offset:vcol.offset + n + 1]
        flat = np.frombuffer(bufs[2], dtype=np.float64)
        d = (offs[1] - offs[0]) // 8
        mat = flat[offs[0] // 8: offs[-1] // 8].reshape(n, d)
        # canonical order: (cluster, centroid_sim ASC, id ASC)
        order = np.lexsort((ids, cs, cl))
        ids, cl, cs, mat = ids[order], cl[order], cs[order], mat[order]
        kept = np.ones(n, dtype=bool)
        seg_starts = np.flatnonzero(np.diff(cl, prepend=cl[0] - 1))
        seg_ends = np.append(seg_starts[1:], n)
        for s, e in zip(seg_starts, seg_ends):
            c = e - s
            if c < 2:
                continue
            m = mat[s:e]
            # strict upper triangle of the boolean mask: entry [j, i]
            # (j earlier in canonical order) flags i as a duplicate
            dup = np.triu(m @ m.T >= threshold, k=1)
            kept[s:e] = ~dup.any(axis=0)
        return pa.table({id_col: pa.array(ids),
                         "cluster": pa.array(cl),
                         "centroid_sim": pa.array(cs, pa.float64()),
                         "kept": pa.array(kept)})

    return _bucketed_groups(ds.map_batches(assign, batch_format="pyarrow"),
                            bucket, dedup_in_bucket,
                            n_buckets=n_buckets,
                            size_hint_bytes=size_hint_bytes)
