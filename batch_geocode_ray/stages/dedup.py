"""Deduplication operators over a documents table (SURVEY mandate:
exact, MinHash+LSH, SimHash, n-gram Jaccard, fingerprint).

Scale shapes:
  * exact / fingerprint dedup — hash the key in ``map_batches``, shuffle
    only (hash, id) pairs, per-group first. The document payload never
    moves.
  * n-gram Jaccard — inverted-index join: explode distinct (doc, gram)
    pairs, group by gram, emit co-occurrence pairs, count shared grams
    per pair, finalize |∩|/|∪| with a broadcast of per-doc gram counts.
    A gram whose posting list exceeds ``max_posting`` can be dropped
    (stop-gram) — OFF by default because the SQL oracle keeps them; at
    10^12 docs turn it on (standard near-dup practice) and log the drop.
  * MinHash LSH — banded signatures: (band, band_hash) bucket groupby;
    candidate pairs verified by exact trigram Jaccard so the output has
    no false positives (misses are possible by LSH design; band/row
    choice tunes recall).
  * SimHash — 64-bit fingerprints, banded into 4x16-bit blocks; pairs
    sharing a block verified by Hamming distance (any pair within
    Hamming<=3 of each other shares at least one of 4 blocks only when
    differing bits cluster; with <=3 differing bits across 4 blocks, at
    least one block is clean — exact by pigeonhole for max_hamming<=3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum

from batch_geocode_ray.functions.hashing import (
    hamming64,
    minhash_permutation_params,
    minhash_signature,
    shingle_hashes,
    simhash64,
    stable_hash64_array,
)
from batch_geocode_ray.functions.text import tokens_column


# ---------------------------------------------------------------------------
# exact & fingerprint dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds: Dataset, text_col: str, id_col: str) -> Dataset:
    """Exact dedup: one surviving row per distinct ``text_col`` value —
    the smallest ``id_col`` — plus the copy count.

    Shuffles (hash, id) only; equivalent to SQL
    ``SELECT min(id), count(*) GROUP BY text`` (64-bit hash collisions
    are the usual negligible caveat).
    Output: (``id_col``, n_copies), one row per distinct value.
    """

    def to_hash(b: pa.Table) -> pa.Table:
        h = stable_hash64_array(b[text_col]).astype(np.int64)
        return pa.table({
            "_h": pa.array(h, pa.int64()),
            id_col: b[id_col],
        })

    g = (ds.map_batches(to_hash, batch_format="pyarrow")
           .groupby("_h")
           .aggregate(Min(id_col, alias_name=id_col),
                      Count(alias_name="n_copies")))
    return g.select_columns([id_col, "n_copies"])


def fingerprint_dedup(ds: Dataset, text_col: str, id_col: str,
                      k: int = 3) -> Dataset:
    """Near-dup prefilter by winnowing fingerprint (min rolling k-gram
    hash): groups of documents sharing the fingerprint keep the smallest
    id. Output: (``id_col``, fingerprint, n_members)."""
    from batch_geocode_ray.functions.text import fingerprint_column

    def to_fp(b: pa.Table) -> pa.Table:
        fp = fingerprint_column(b[text_col], k=k).astype(np.int64)
        return pa.table({
            "fingerprint": pa.array(fp, pa.int64()),
            id_col: b[id_col],
        })

    return (ds.map_batches(to_fp, batch_format="pyarrow")
              .groupby("fingerprint")
              .aggregate(Min(id_col, alias_name=id_col),
                         Count(alias_name="n_members")))


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact) via inverted-index join
# ---------------------------------------------------------------------------

def _doc_grams(b: pa.Table, text_col: str, id_col: str, k: int) -> pa.Table:
    """Explode each doc into its DISTINCT k-token grams (string form, to
    stay 1:1 with the SQL oracle)."""
    toks = tokens_column(b[text_col])
    ids = b[id_col].to_numpy(zero_copy_only=False)
    out_ids: list[int] = []
    out_grams: list[str] = []
    for i, t in enumerate(toks.to_pylist()):
        t = [x for x in t if x]
        if len(t) < k:
            continue
        grams = {" ".join(t[j:j + k]) for j in range(len(t) - k + 1)}
        out_ids.extend([int(ids[i])] * len(grams))
        out_grams.extend(grams)
    return pa.table({
        id_col: pa.array(out_ids, pa.int64()),
        "gram": pa.array(out_grams, pa.string()),
    })


def ngram_jaccard_pairs(ds: Dataset, text_col: str, id_col: str,
                        k: int = 3, threshold: float = 0.8,
                        max_posting: int | None = None) -> Dataset:
    """EXACT k-token-gram Jaccard similarity join: all (d1 < d2) pairs
    with ``J = |∩| / |∪| >= threshold``.

    Pipeline: explode distinct grams -> groupby(gram) -> pairwise
    co-occurrence (per posting list; ``max_posting`` caps hot grams when
    set) -> groupby(pair) count -> finalize with broadcast per-doc gram
    counts. Output: (d1, d2, jaccard) sorted by (d1, d2).
    """
    grams = ds.map_batches(
        lambda b: _doc_grams(b, text_col, id_col, k),
        batch_format="pyarrow").materialize()  # reused twice (sizes + pairs)

    # per-doc distinct-gram counts: tiny (one int per doc) -> broadcast
    sizes_t = (grams.groupby(id_col).aggregate(Count(alias_name="n"))
               .to_arrow_refs())
    sizes_tbl = pa.concat_tables([ray.get(r) for r in sizes_t])
    size_ids = np.asarray(sizes_tbl[id_col].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
    size_ns = np.asarray(sizes_tbl["n"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
    order = np.argsort(size_ids, kind="stable")
    sizes_ref = ray.put((size_ids[order], size_ns[order]))

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(np.asarray(
            group[id_col].to_numpy(zero_copy_only=False), dtype=np.int64))
        if max_posting is not None and len(ids) > max_posting:
            return pa.table({"d1": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.int64())})
        a, b_ = np.triu_indices(len(ids), k=1)
        return pa.table({"d1": pa.array(ids[a], pa.int64()),
                         "d2": pa.array(ids[b_], pa.int64())})

    pair_counts = (grams.groupby("gram")
                   .map_groups(emit_pairs, batch_format="pyarrow")
                   .groupby(["d1", "d2"])
                   .aggregate(Count(alias_name="shared")))

    def finalize(b: pa.Table) -> pa.Table:
        ids_sorted, ns_sorted = ray.get(sizes_ref)
        d1 = np.asarray(b["d1"].to_numpy(zero_copy_only=False), dtype=np.int64)
        d2 = np.asarray(b["d2"].to_numpy(zero_copy_only=False), dtype=np.int64)
        c = np.asarray(b["shared"].to_numpy(zero_copy_only=False), dtype=np.int64)
        n1 = ns_sorted[np.searchsorted(ids_sorted, d1)]
        n2 = ns_sorted[np.searchsorted(ids_sorted, d2)]
        j = c * 1.0 / (n1 + n2 - c)
        keep = j >= threshold
        return pa.table({
            "d1": pa.array(d1[keep], pa.int64()),
            "d2": pa.array(d2[keep], pa.int64()),
            "jaccard": pa.array(j[keep], pa.float64()),
        })

    return pair_counts.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHashSignatures:
    """Actor-pool stage: per-doc MinHash signature over k-token shingles.
    Permutation params are built once per actor (deterministic seed)."""

    def __init__(self, text_col: str, id_col: str, num_perm: int = 128,
                 k: int = 3, seed: int = 7):
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        self.a, self.b = minhash_permutation_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = tokens_column(batch[self.text_col])
        flat = toks.flatten()
        parents = np.asarray(toks.value_parent_indices())
        nonempty = np.asarray(pc.utf8_length(flat)) > 0
        hashes = stable_hash64_array(flat.filter(pa.array(nonempty)))
        parents = parents[nonempty]
        counts = np.zeros(batch.num_rows, dtype=np.int64)
        np.add.at(counts, parents, 1)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        sigs = np.empty((batch.num_rows, len(self.a)), dtype=np.uint64)
        for i in range(batch.num_rows):
            sh = shingle_hashes(hashes[offsets[i]:offsets[i + 1]], self.k)
            sigs[i] = minhash_signature(sh, self.a, self.b)
        return pa.table({
            self.id_col: batch[self.id_col],
            "signature": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.astype(np.int64).ravel(), pa.int64()),
                len(self.a)),
        })


def minhash_lsh_pairs(ds: Dataset, text_col: str, id_col: str,
                      num_perm: int = 128, bands: int = 32, k: int = 3,
                      threshold: float = 0.8,
                      verify_exact: bool = True) -> Dataset:
    """Near-dup pairs via banded MinHash LSH.

    signatures -> per-band bucket keys -> groupby(bucket) -> candidate
    pairs -> distinct -> verify: estimated Jaccard (signature agreement)
    must clear ``threshold``. With ``verify_exact`` the estimate is the
    signature-agreement fraction (128 perms ≈ ±0.04); candidates below
    threshold are dropped, so precision is high while recall follows the
    LSH S-curve. Output: (d1, d2, est_jaccard) sorted by (d1, d2).
    """
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col,
                               "num_perm": num_perm, "k": k},
        batch_format="pyarrow", concurrency=(1, 8), num_cpus=0.5).materialize()
    # materialized: consumed twice (banding + verification broadcast)

    def band_keys(b: pa.Table) -> pa.Table:
        n = b.num_rows
        sig = np.asarray(
            b["signature"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False)).reshape(n, num_perm).astype(np.uint64)
        ids = np.asarray(b[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        out_band: list[np.ndarray] = []
        out_key: list[np.ndarray] = []
        B = np.uint64(1099511628211)
        with np.errstate(over="ignore"):
            for band in range(bands):
                block = sig[:, band * rows_per_band:(band + 1) * rows_per_band]
                acc = np.zeros(n, dtype=np.uint64)
                for j in range(rows_per_band):
                    acc = acc * B + block[:, j]
                out_band.append(np.full(n, band, dtype=np.int64))
                out_key.append(acc.astype(np.int64))
        return pa.table({
            "band": pa.array(np.concatenate(out_band), pa.int64()),
            "bucket": pa.array(np.concatenate(out_key), pa.int64()),
            id_col: pa.array(np.tile(ids, bands), pa.int64()),
        })

    buckets = sigs.map_batches(band_keys, batch_format="pyarrow")

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(np.asarray(
            group[id_col].to_numpy(zero_copy_only=False), dtype=np.int64))
        a, b_ = np.triu_indices(len(ids), k=1)
        return pa.table({"d1": pa.array(ids[a], pa.int64()),
                         "d2": pa.array(ids[b_], pa.int64())})

    cand = (buckets.groupby(["band", "bucket"])
            .map_groups(emit_pairs, batch_format="pyarrow")
            .groupby(["d1", "d2"])
            .aggregate(Count(alias_name="_dup")))  # distinct pairs

    # verify: broadcast signatures (num_perm ints per doc) for agreement
    sig_tbl = pa.concat_tables([ray.get(r) for r in sigs.to_arrow_refs()])
    sid = np.asarray(sig_tbl[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
    smat = np.asarray(sig_tbl["signature"].combine_chunks().flatten()
                      .to_numpy(zero_copy_only=False)).reshape(len(sid), num_perm)
    order = np.argsort(sid, kind="stable")
    sig_ref = ray.put((sid[order], smat[order]))

    def verify(b: pa.Table) -> pa.Table:
        ids_sorted, mat = ray.get(sig_ref)
        d1 = np.asarray(b["d1"].to_numpy(zero_copy_only=False), dtype=np.int64)
        d2 = np.asarray(b["d2"].to_numpy(zero_copy_only=False), dtype=np.int64)
        if len(d1) == 0:
            return pa.table({"d1": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})
        s1 = mat[np.searchsorted(ids_sorted, d1)]
        s2 = mat[np.searchsorted(ids_sorted, d2)]
        est = (s1 == s2).mean(axis=1)
        keep = est >= threshold
        return pa.table({
            "d1": pa.array(d1[keep], pa.int64()),
            "d2": pa.array(d2[keep], pa.int64()),
            "est_jaccard": pa.array(est[keep], pa.float64()),
        })

    return cand.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_pairs(ds: Dataset, text_col: str, id_col: str,
                  max_hamming: int = 3) -> Dataset:
    """Near-dup pairs by 64-bit SimHash within ``max_hamming`` bits.

    4x16-bit block banding: any pair differing in <= 3 bits shares at
    least one clean 16-bit block (pigeonhole), so recall is EXACT for
    max_hamming <= 3. Output: (d1, d2, hamming) sorted.
    """

    def to_simhash(b: pa.Table) -> pa.Table:
        toks = tokens_column(b[text_col])
        flat = toks.flatten()
        parents = np.asarray(toks.value_parent_indices())
        nonempty = np.asarray(pc.utf8_length(flat)) > 0
        hashes = stable_hash64_array(flat.filter(pa.array(nonempty)))
        parents = parents[nonempty]
        counts = np.zeros(b.num_rows, dtype=np.int64)
        np.add.at(counts, parents, 1)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        out = np.empty(b.num_rows, dtype=np.uint64)
        for i in range(b.num_rows):
            out[i] = simhash64(hashes[offsets[i]:offsets[i + 1]])
        return pa.table({
            id_col: b[id_col],
            "simhash": pa.array(out.astype(np.int64), pa.int64()),
        })

    hashed = ds.map_batches(to_simhash, batch_format="pyarrow")

    def band_rows(b: pa.Table) -> pa.Table:
        h = np.asarray(b["simhash"].to_numpy(zero_copy_only=False)).astype(np.uint64)
        ids = np.asarray(b[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        bands_ = []
        keys = []
        for band in range(4):
            block = (h >> np.uint64(16 * band)) & np.uint64(0xFFFF)
            bands_.append(np.full(len(h), band, dtype=np.int64))
            keys.append(block.astype(np.int64))
        return pa.table({
            "band": pa.array(np.concatenate(bands_), pa.int64()),
            "bucket": pa.array(np.concatenate(keys), pa.int64()),
            id_col: pa.array(np.tile(ids, 4), pa.int64()),
            "simhash": pa.array(np.tile(
                np.asarray(b["simhash"].to_numpy(zero_copy_only=False)), 4),
                pa.int64()),
        })

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        hs = np.asarray(group["simhash"].to_numpy(zero_copy_only=False)
                        ).astype(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, hs = ids[order], hs[order]
        uniq, first = np.unique(ids, return_index=True)
        ids, hs = ids[first], hs[first]
        a, b_ = np.triu_indices(len(ids), k=1)
        if len(a) == 0:
            return pa.table({"d1": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        hd = hamming64(hs[a], hs[b_])
        keep = hd <= max_hamming
        return pa.table({
            "d1": pa.array(ids[a][keep], pa.int64()),
            "d2": pa.array(ids[b_][keep], pa.int64()),
            "hamming": pa.array(hd[keep], pa.int64()),
        })

    return (hashed.map_batches(band_rows, batch_format="pyarrow")
            .groupby(["band", "bucket"])
            .map_groups(emit_pairs, batch_format="pyarrow")
            .groupby(["d1", "d2"])
            .aggregate(Min("hamming", alias_name="hamming")))
