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

    def final_topk(group: pa.Table) -> pa.Table:
        qid = group["query_id"][0].as_py()
        s = np.asarray(group["sim"].to_numpy(zero_copy_only=False))
        nid = np.asarray(group["neighbor_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        order = np.lexsort((nid, -s))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid, dtype=np.int64)),
            "neighbor_id": pa.array(nid[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        })

    return (ds.map_batches(partial_topk, batch_format="pyarrow")
            .groupby("query_id")
            .map_groups(final_topk, batch_format="pyarrow"))


def cosine_neardup_pairs(ds: Dataset, vec_col: str, id_col: str,
                         threshold: float = 0.4) -> Dataset:
    """All (a < b) vector pairs with cosine >= threshold.

    The full normalized matrix is broadcast once (fine up to ~10^6x
    small-d vectors ~ GBs); each batch multiplies against it and emits
    its above-threshold pairs — a blocked exact similarity join with no
    shuffle of the big side. For larger corpora switch to LSH
    bucketing (random hyperplanes) and verify within buckets.
    Output: (d1, d2, cosine) sorted by (d1, d2).
    """
    all_tbl = pa.concat_tables([ray.get(r) for r in
                                ds.select_columns([id_col, vec_col])
                                .to_arrow_refs()])
    all_ids = np.asarray(all_tbl[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
    all_m = _normalize(_matrix_of(all_tbl, vec_col))
    ref = ray.put((all_ids, all_m))

    def emit(batch: pa.Table) -> pa.Table:
        ids_all, m_all = ray.get(ref)
        m = _normalize(_matrix_of(batch, vec_col))
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        if len(ids) == 0:
            return pa.table({"d1": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sims = m @ m_all.T
        keep = (sims >= threshold) & (ids[:, None] < ids_all[None, :])
        r, c = np.nonzero(keep)
        return pa.table({
            "d1": pa.array(ids[r], pa.int64()),
            "d2": pa.array(ids_all[c], pa.int64()),
            "cosine": pa.array(sims[r, c], pa.float64()),
        })

    return ds.map_batches(emit, batch_format="pyarrow")


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
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
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
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(d2.argmin(axis=1).astype(np.int64)),
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

    def final_topk(group: pa.Table) -> pa.Table:
        qid = group["query_id"][0].as_py()
        s = np.asarray(group["sim"].to_numpy(zero_copy_only=False))
        nid = np.asarray(group["neighbor_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        order = np.lexsort((nid, -s))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid, dtype=np.int64)),
            "neighbor_id": pa.array(nid[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("query_id")
            .map_groups(final_topk, batch_format="pyarrow"))
