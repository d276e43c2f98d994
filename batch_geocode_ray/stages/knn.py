"""kNN nearest-facility lookup (SURVEY §2.5 J4, §2.7 T4).

Two physical plans, same semantics (k nearest facilities by haversine
distance, ties broken by smaller facility_id):

  * ``KNNFacilities`` (broadcast): the facility table rides `ray.put`
    into an actor pool; each batch computes a vectorized
    points x facilities haversine matrix and partial top-k with
    argpartition. Right plan while facilities fit in worker memory
    (≤ ~1e6 rows) — no shuffle at all.
  * grid-probe path (``use_grid=True``): facilities pre-bucketed into
    coarse hex cells; each point probes its cell's k-ring first and
    falls back to brute force only when the neighborhood has fewer
    than k facilities. The scale path for very large facility tables,
    and the per-tile shape the north rule asks for after an H3-prefix
    repartition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from batch_geocode_ray.functions.cells import hex_cell, hex_kring
from batch_geocode_ray.functions.geo import haversine_km


class FacilityIndex:
    def __init__(self, facilities: pa.Table, grid_res: int = 2):
        self.ids = np.asarray(facilities["facility_id"].to_numpy(zero_copy_only=False),
                              dtype=np.int64)
        self.lat = np.asarray(facilities["lat"].to_numpy(zero_copy_only=False), dtype=np.float64)
        self.lon = np.asarray(facilities["lon"].to_numpy(zero_copy_only=False), dtype=np.float64)
        self.grid_res = grid_res
        cells = hex_cell(self.lon, self.lat, grid_res)
        self.buckets: dict[int, np.ndarray] = {}
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        bounds = np.nonzero(np.diff(sorted_cells))[0] + 1
        for chunk in np.split(order, bounds):
            if len(chunk):
                self.buckets[int(cells[chunk[0]])] = chunk


class KNNFacilities:
    """map_batches actor stage appending ``knn_ids``/``knn_dists``
    (list<int64> / list<float64>, distance-ordered, id tie-break).
    Rows with null coordinates get empty lists.
    """

    def __init__(self, facilities, k: int = 3,
                 lon_col: str = "best_long", lat_col: str = "best_lat",
                 use_grid: bool = False):
        import ray

        idx = ray.get(facilities) if isinstance(facilities, ray.ObjectRef) else facilities
        if isinstance(idx, pa.Table):
            idx = FacilityIndex(idx)
        self.index: FacilityIndex = idx
        self.k = k
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.use_grid = use_grid

    def _topk_bruteforce(self, lon: np.ndarray, lat: np.ndarray):
        """(B, k) ids + dists via a vectorized distance matrix, chunked
        to bound memory at B*F floats."""
        idx = self.index
        k = min(self.k, len(idx.ids))
        out_ids = np.empty((len(lon), k), dtype=np.int64)
        out_d = np.empty((len(lon), k), dtype=np.float64)
        chunk = max(1, int(4_000_000 // max(len(idx.ids), 1)))
        for s in range(0, len(lon), chunk):
            e = min(s + chunk, len(lon))
            d = haversine_km(lon[s:e, None], lat[s:e, None], idx.lon[None, :], idx.lat[None, :])
            # partial top-k then exact ordering with (dist, id) tie-break
            part = np.argpartition(d, k - 1, axis=1)[:, :k]
            pd = np.take_along_axis(d, part, axis=1)
            pids = idx.ids[part]
            order = np.lexsort((pids, pd), axis=1)
            out_ids[s:e] = np.take_along_axis(pids, order, axis=1)
            out_d[s:e] = np.take_along_axis(pd, order, axis=1)
        return out_ids, out_d

    def _topk_grid(self, lon: np.ndarray, lat: np.ndarray):
        """Grid probe with an EXACTNESS guarantee: ring results are only
        accepted when the k-th candidate distance is within the ring's
        guaranteed-coverage radius (anything outside the 1-ring is at
        least ~0.7 cell-sizes away; km lower-bounded via cos(lat) since
        longitude degrees shrink poleward). Otherwise fall back to the
        exact scan — approximate never silently, wrong never."""
        idx = self.index
        k = min(self.k, len(idx.ids))
        cells = hex_cell(lon, lat, idx.grid_res)
        size_deg = 10.0 / (np.sqrt(7.0) ** idx.grid_res)
        out_ids = np.empty((len(lon), k), dtype=np.int64)
        out_d = np.empty((len(lon), k), dtype=np.float64)
        cache: dict[int, np.ndarray] = {}
        all_cand = np.arange(len(idx.ids))
        for i in range(len(lon)):
            c = int(cells[i])
            cand = cache.get(c)
            if cand is None:
                parts = [idx.buckets[b] for b in hex_kring(c, 1) if b in idx.buckets]
                cand = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
                cache[c] = cand
            guarantee_km = (0.7 * size_deg * 111.0
                            * max(np.cos(np.radians(abs(lat[i]))), 0.0))
            use = cand if len(cand) >= k else all_cand
            d = haversine_km(lon[i], lat[i], idx.lon[use], idx.lat[use])
            order = np.lexsort((idx.ids[use], d))[:k]
            if use is not all_cand and d[order[-1]] > guarantee_km:
                # k-th hit may be beaten by a facility outside the ring
                use = all_cand
                d = haversine_km(lon[i], lat[i], idx.lon[use], idx.lat[use])
                order = np.lexsort((idx.ids[use], d))[:k]
            out_ids[i] = idx.ids[use[order]]
            out_d[i] = d[order]
        return out_ids, out_d

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = np.asarray(batch[self.lon_col].to_numpy(zero_copy_only=False), dtype=np.float64)
        lat = np.asarray(batch[self.lat_col].to_numpy(zero_copy_only=False), dtype=np.float64)
        ok = ~(np.isnan(lon) | np.isnan(lat))
        n = len(lon)
        k = min(self.k, len(self.index.ids))
        if ok.any():
            fn = self._topk_grid if self.use_grid else self._topk_bruteforce
            ids_ok, d_ok = fn(lon[ok], lat[ok])
        else:
            ids_ok = np.empty((0, k), dtype=np.int64)
            d_ok = np.empty((0, k), dtype=np.float64)

        counts = np.where(ok, k, 0).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        # ok rows appear in order, each contributing exactly k entries
        flat_ids = ids_ok.ravel()
        flat_d = d_ok.ravel()
        batch = batch.append_column(
            "knn_ids", pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                                pa.array(flat_ids, pa.int64())))
        batch = batch.append_column(
            "knn_dists", pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                                  pa.array(flat_d, pa.float64())))
        return batch
