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


def _unit_xyz(lon_deg: np.ndarray, lat_deg: np.ndarray) -> np.ndarray:
    """(n, 3) unit sphere vectors; chord distance on these is exactly
    monotone with great-circle distance, so top-k by chord == top-k by
    haversine (same tie sets: equal chord <=> equal haversine)."""
    lon = np.radians(lon_deg)
    lat = np.radians(lat_deg)
    cl = np.cos(lat)
    return np.stack([cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)],
                    axis=1)


class FacilityIndex:
    def __init__(self, facilities: pa.Table, grid_res: int = 2):
        self.ids = np.asarray(facilities["facility_id"].to_numpy(zero_copy_only=False),
                              dtype=np.int64)
        self.lat = np.asarray(facilities["lat"].to_numpy(zero_copy_only=False), dtype=np.float64)
        self.lon = np.asarray(facilities["lon"].to_numpy(zero_copy_only=False), dtype=np.float64)
        self.xyz = _unit_xyz(self.lon, self.lat)  # for the matmul plan
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
        from batch_geocode_ray.functions.cells import hex_kring_array

        lat = np.asarray(b["lat"].to_numpy(zero_copy_only=False), np.float64)
        lon = np.asarray(b["lon"].to_numpy(zero_copy_only=False), np.float64)
        ids = np.asarray(b["facility_id"].to_numpy(zero_copy_only=False),
                         np.int64)
        ring = hex_kring_array(hex_cell(lon, lat, grid_res), 1)  # (n, 7)
        m = ring.shape[1] if len(ids) else 0
        total = len(ids) * m
        return pa.table({
            "_cell": pa.array(ring.ravel(), pa.int64()),
            "_fid": pa.array(np.repeat(ids, m), pa.int64()),
            "_flon": pa.array(np.repeat(lon, m), pa.float64()),
            "_flat": pa.array(np.repeat(lat, m), pa.float64()),
            "_side": pa.array(["f"] * total, pa.string()),
            id_col: pa.array([None] * total, pa.string()),
            "_plon": pa.array([None] * total, pa.float64()),
            "_plat": pa.array([None] * total, pa.float64()),
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
        """(B, k) ids + dists, chunked to bound memory at B*F floats.

        Candidate selection runs on the CHORD metric — one (B, 3) x
        (3, F) BLAS matmul of unit vectors instead of a B x F
        transcendental haversine matrix (chord is exactly monotone with
        great-circle distance, so the selected k and every tie set are
        identical; measured ~20x faster at F=1000). Exact haversine km
        is then computed only for the B x k selected, and the final
        (dist, id) tie-break ordering uses those exact values."""
        idx = self.index
        k = min(self.k, len(idx.ids))
        out_ids = np.empty((len(lon), k), dtype=np.int64)
        out_d = np.empty((len(lon), k), dtype=np.float64)
        pxyz = _unit_xyz(lon, lat)
        chunk = max(1, int(4_000_000 // max(len(idx.ids), 1)))
        for s in range(0, len(lon), chunk):
            e = min(s + chunk, len(lon))
            # negated dot product: ascending order == nearest first
            nd = -(pxyz[s:e] @ idx.xyz.T)
            part = np.argpartition(nd, k - 1, axis=1)[:, :k]
            pd = haversine_km(lon[s:e, None], lat[s:e, None],
                              idx.lon[part], idx.lat[part])
            pids = idx.ids[part]
            order = np.lexsort((pids, pd), axis=1)
            out_ids[s:e] = np.take_along_axis(pids, order, axis=1)
            out_d[s:e] = np.take_along_axis(pd, order, axis=1)
        return out_ids, out_d

    def _topk_grid(self, lon: np.ndarray, lat: np.ndarray):
        """Grid probe with an EXACTNESS guarantee, vectorized per CELL
        GROUP (not per row): rows are bucketed by their coarse hex
        cell; each group multiplies against its ring's few candidates
        only. Ring results are accepted only when the k-th candidate
        distance is within the ring's guaranteed-coverage radius
        (anything outside the 1-ring is at least ~0.7 cell-sizes away;
        km lower-bounded via cos(lat) since longitude degrees shrink
        poleward); every other row falls back to the exact brute-force
        scan — approximate never silently, wrong never."""
        idx = self.index
        n = len(lon)
        k = min(self.k, len(idx.ids))
        cells = hex_cell(lon, lat, idx.grid_res).astype(np.int64)
        size_deg = 10.0 / (np.sqrt(7.0) ** idx.grid_res)
        out_ids = np.empty((n, k), dtype=np.int64)
        out_d = np.empty((n, k), dtype=np.float64)
        resolved = np.zeros(n, dtype=bool)
        pxyz = _unit_xyz(lon, lat)
        guarantee = (0.7 * size_deg * 111.0
                     * np.maximum(np.cos(np.radians(np.abs(lat))), 0.0))

        order = np.argsort(cells, kind="stable")
        sc = cells[order]
        bounds = np.concatenate(
            [[0], np.nonzero(np.diff(sc))[0] + 1, [n]]) if n else [0]
        cache: dict[int, np.ndarray] = {}
        for s, e in zip(bounds[:-1], bounds[1:]):
            c = int(sc[s])
            cand = cache.get(c)
            if cand is None:
                parts = [idx.buckets[b] for b in hex_kring(c, 1)
                         if b in idx.buckets]
                cand = (np.concatenate(parts) if parts
                        else np.empty(0, dtype=np.int64))
                cache[c] = cand
            if len(cand) < k:
                continue  # group falls back to brute force
            rows = order[s:e]
            kk = min(k, len(cand))
            nd = -(pxyz[rows] @ idx.xyz[cand].T)
            part = (np.argpartition(nd, kk - 1, axis=1)[:, :kk]
                    if len(cand) > kk else
                    np.broadcast_to(np.arange(kk), (len(rows), kk)))
            cpart = cand[part]
            d = haversine_km(lon[rows, None], lat[rows, None],
                             idx.lon[cpart], idx.lat[cpart])
            pids = idx.ids[cpart]
            o2 = np.lexsort((pids, d), axis=1)
            d_s = np.take_along_axis(d, o2, axis=1)
            ok = d_s[:, -1] <= guarantee[rows]
            good = rows[ok]
            out_ids[good] = np.take_along_axis(pids, o2, axis=1)[ok]
            out_d[good] = d_s[ok]
            resolved[good] = True

        rest = np.nonzero(~resolved)[0]
        if len(rest):
            out_ids[rest], out_d[rest] = self._topk_bruteforce(
                lon[rest], lat[rest])
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
