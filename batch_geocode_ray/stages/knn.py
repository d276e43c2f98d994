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


def knn_partitioned(points: "Dataset", facilities: "Dataset", k: int = 3,
                    grid_res: int = 2, id_col: str = "url",
                    lon_col: str = "best_long", lat_col: str = "best_lat") -> "Dataset":
    """Co-partitioned kNN for facility tables too big to broadcast
    (SURVEY J4's scale path; the north rule's "repartition by cell
    prefix" shape).

    Physical plan: facilities replicate into their own cell plus its
    k-ring-1 neighbors (x7 halo); points go to their own cell; one
    groupby(cell) co-locates each point with every facility within one
    ring. Per-point exactness is guaranteed when the k-th hit lies
    inside the ring's covered radius — rows where it does not are
    flagged ``knn_exact = false`` (the caller re-runs those few through
    the broadcast path or a wider halo).

    PARTITIONING ASSUMPTION: one cell's points + haloed facilities fit
    in a worker's memory — pick ``grid_res`` so the densest cell does.
    Points with null coordinates are dropped (no cell).
    """
    size_deg = 10.0 / (np.sqrt(7.0) ** grid_res)

    def fac_explode(b: pa.Table) -> pa.Table:
        lat = np.asarray(b["lat"].to_numpy(zero_copy_only=False), np.float64)
        lon = np.asarray(b["lon"].to_numpy(zero_copy_only=False), np.float64)
        ids = np.asarray(b["facility_id"].to_numpy(zero_copy_only=False),
                         np.int64)
        cells = hex_cell(lon, lat, grid_res)
        out_cell, out_id, out_lon, out_lat = [], [], [], []
        for i in range(len(ids)):
            for cell in hex_kring(int(cells[i]), 1):
                out_cell.append(cell)
                out_id.append(ids[i])
                out_lon.append(lon[i])
                out_lat.append(lat[i])
        return pa.table({
            "_cell": pa.array(out_cell, pa.int64()),
            "_fid": pa.array(out_id, pa.int64()),
            "_flon": pa.array(out_lon, pa.float64()),
            "_flat": pa.array(out_lat, pa.float64()),
            "_side": pa.array(["f"] * len(out_cell), pa.string()),
            id_col: pa.array([None] * len(out_cell), pa.string()),
            "_plon": pa.array([None] * len(out_cell), pa.float64()),
            "_plat": pa.array([None] * len(out_cell), pa.float64()),
        })

    def point_rows(b: pa.Table) -> pa.Table:
        lon = np.asarray(b[lon_col].to_numpy(zero_copy_only=False), np.float64)
        lat = np.asarray(b[lat_col].to_numpy(zero_copy_only=False), np.float64)
        ok = ~(np.isnan(lon) | np.isnan(lat))
        ids = np.asarray(b[id_col].to_pylist(), dtype=object)[ok]
        lon, lat = lon[ok], lat[ok]
        cells = hex_cell(lon, lat, grid_res).astype(np.int64)
        n = len(lon)
        return pa.table({
            "_cell": pa.array(cells, pa.int64()),
            "_fid": pa.array([None] * n, pa.int64()),
            "_flon": pa.array([None] * n, pa.float64()),
            "_flat": pa.array([None] * n, pa.float64()),
            "_side": pa.array(["p"] * n, pa.string()),
            id_col: pa.array(ids.tolist(), pa.string()),
            "_plon": pa.array(lon, pa.float64()),
            "_plat": pa.array(lat, pa.float64()),
        })

    both = facilities.map_batches(fac_explode, batch_format="pyarrow").union(
        points.map_batches(point_rows, batch_format="pyarrow"))

    def local_knn(group: pa.Table) -> pa.Table:
        side = np.asarray(group["_side"].to_numpy(zero_copy_only=False))
        is_f = side == "f"
        f_ids = np.asarray(group["_fid"].to_numpy(zero_copy_only=False)
                           )[is_f].astype(np.int64)
        f_lon = np.asarray(group["_flon"].to_numpy(zero_copy_only=False)
                           )[is_f].astype(np.float64)
        f_lat = np.asarray(group["_flat"].to_numpy(zero_copy_only=False)
                           )[is_f].astype(np.float64)
        p_mask = ~is_f
        p_ids = np.asarray(group[id_col].to_pylist(), dtype=object)[p_mask]
        p_lon = np.asarray(group["_plon"].to_numpy(zero_copy_only=False)
                           )[p_mask].astype(np.float64)
        p_lat = np.asarray(group["_plat"].to_numpy(zero_copy_only=False)
                           )[p_mask].astype(np.float64)
        n = len(p_ids)
        if n == 0:
            return pa.table({
                id_col: pa.array([], pa.string()),
                "knn_ids": pa.array([], pa.list_(pa.int64())),
                "knn_dists": pa.array([], pa.list_(pa.float64())),
                "knn_exact": pa.array([], pa.bool_()),
            })
        kk = min(k, len(f_ids))
        out_ids, out_d, out_exact = [], [], []
        guarantee = (0.7 * size_deg * 111.0
                     * np.maximum(np.cos(np.radians(np.abs(p_lat))), 0.0))
        for i in range(n):
            if kk == 0:
                out_ids.append([])
                out_d.append([])
                out_exact.append(False)
                continue
            d = haversine_km(p_lon[i], p_lat[i], f_lon, f_lat)
            order = np.lexsort((f_ids, d))[:kk]
            out_ids.append(f_ids[order].tolist())
            out_d.append(d[order].tolist())
            out_exact.append(bool(len(f_ids) >= k and
                                  d[order[-1]] <= guarantee[i]))
        return pa.table({
            id_col: pa.array(p_ids.tolist(), pa.string()),
            "knn_ids": pa.array(out_ids, pa.list_(pa.int64())),
            "knn_dists": pa.array(out_d, pa.list_(pa.float64())),
            "knn_exact": pa.array(out_exact, pa.bool_()),
        })

    return both.groupby("_cell").map_groups(local_knn, batch_format="pyarrow")


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
