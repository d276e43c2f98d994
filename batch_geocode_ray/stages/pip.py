"""Point-in-polygon broadcast join (SURVEY §2.5 J3).

The admin-polygon side is small (thousands of polygons); the page side
is the 10^12-row stream. So: pack an STR bulk-loaded R-tree over the
polygons ONCE on the driver, ``ray.put`` it, and probe it from an actor
pool inside ``map_batches`` — the big side never shuffles.

From-scratch pieces (no shapely/geos in the sandbox):
  * STR packing: sort polygon bboxes by center-x into vertical slices,
    sort each slice by center-y, emit fixed-capacity leaves (the
    classic Sort-Tile-Recursive bulk load).
  * Containment: even-odd ray casting, vectorized over candidate
    points per polygon edge.

Assignment when polygons nest/overlap (countries contain provinces):
deepest ``admin_level`` wins, ties broken by smallest ``admin_id`` —
deterministic, and oracle-reproducible in plain Python/SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class PolygonIndex:
    """Immutable packed polygon set + STR R-tree (broadcast).

    Leaves come from the classic STR bulk load; INTERNAL levels chunk
    the (slice-then-y sorted, therefore spatially coherent) child list
    ``node_capacity`` at a time up to a root — so probes descend the
    tree and prune whole subtrees per batch instead of linearly
    scanning every leaf bbox. At 10^3 polygons the linear scan was
    fine; at 10^5+ admin sets it degrades ~100x (VERDICT r4 #6); the
    descent visits O(log n + hit leaves) instead. ``last_leaf_visits``
    records how many leaves the most recent :meth:`assign` actually
    bbox-tested (observability for the sublinearity pytest)."""

    def __init__(self, admin_table: pa.Table, leaf_capacity: int = 8,
                 node_capacity: int = 16):
        self.admin_id = np.asarray(admin_table["admin_id"].to_numpy(zero_copy_only=False))
        self.admin_level = np.asarray(admin_table["admin_level"].to_numpy(zero_copy_only=False))
        self.cc = admin_table["cc"].to_pylist()
        lons = admin_table["ring_lons"].combine_chunks()
        lats = admin_table["ring_lats"].combine_chunks()
        self.ring_lons = [np.asarray(x, dtype=np.float64) for x in lons.to_pylist()]
        self.ring_lats = [np.asarray(x, dtype=np.float64) for x in lats.to_pylist()]

        n = len(self.ring_lons)
        self.bb_min_x = np.array([r.min() for r in self.ring_lons])
        self.bb_max_x = np.array([r.max() for r in self.ring_lons])
        self.bb_min_y = np.array([r.min() for r in self.ring_lats])
        self.bb_max_y = np.array([r.max() for r in self.ring_lats])

        # STR pack: slices by center-x, runs by center-y
        cx = (self.bb_min_x + self.bb_max_x) / 2
        cy = (self.bb_min_y + self.bb_max_y) / 2
        n_leaves = max(1, int(np.ceil(n / leaf_capacity)))
        n_slices = max(1, int(np.ceil(np.sqrt(n_leaves))))
        per_slice = int(np.ceil(n / n_slices))
        order_x = np.argsort(cx, kind="stable")
        self.leaves: list[np.ndarray] = []
        for s in range(n_slices):
            sl = order_x[s * per_slice:(s + 1) * per_slice]
            if len(sl) == 0:
                continue
            sl = sl[np.argsort(cy[sl], kind="stable")]
            for i in range(0, len(sl), leaf_capacity):
                self.leaves.append(sl[i:i + leaf_capacity])
        self.leaf_min_x = np.array([self.bb_min_x[m].min() for m in self.leaves])
        self.leaf_max_x = np.array([self.bb_max_x[m].max() for m in self.leaves])
        self.leaf_min_y = np.array([self.bb_min_y[m].min() for m in self.leaves])
        self.leaf_max_y = np.array([self.bb_max_y[m].max() for m in self.leaves])

        # internal levels, bottom-up: level L groups level L-1's nodes
        # (level 0 groups leaves) in runs of node_capacity. Children of
        # node i at any level are the contiguous span
        # [starts[i], ends[i]) of the level below — contiguity is free
        # because the STR order is already spatial.
        self.inner_levels: list[tuple] = []
        c_min_x, c_max_x = self.leaf_min_x, self.leaf_max_x
        c_min_y, c_max_y = self.leaf_min_y, self.leaf_max_y
        while len(c_min_x) > node_capacity:
            n_nodes = int(np.ceil(len(c_min_x) / node_capacity))
            starts = np.arange(n_nodes, dtype=np.int64) * node_capacity
            ends = np.minimum(starts + node_capacity,
                              len(c_min_x)).astype(np.int64)
            c_min_x = np.minimum.reduceat(c_min_x, starts)
            c_max_x = np.maximum.reduceat(c_max_x, starts)
            c_min_y = np.minimum.reduceat(c_min_y, starts)
            c_max_y = np.maximum.reduceat(c_max_y, starts)
            self.inner_levels.append(
                (c_min_x, c_max_x, c_min_y, c_max_y, starts, ends))
        self.last_leaf_visits = 0

    def contains(self, poly: int, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Even-odd ray-casting test of points against one polygon ring,
        vectorized over points (edges looped — rings are short).
        Boundary convention: the half-open edge rule of the crossing
        test (consistent, deterministic).
        """
        xs, ys = self.ring_lons[poly], self.ring_lats[poly]
        inside = np.zeros(len(px), dtype=bool)
        j = len(xs) - 1
        for i in range(len(xs)):
            x1, y1, x2, y2 = xs[j], ys[j], xs[i], ys[i]
            cond = (y1 > py) != (y2 > py)
            if cond.any():
                x_cross = (x2 - x1) * (py - y1) / (y2 - y1) + x1
                inside ^= cond & (px < x_cross)
            j = i
        return inside

    def _candidate_leaves(self, px: np.ndarray, py: np.ndarray):
        """Yield (leaf_index, candidate point indices) by descending
        the internal levels, pruning every subtree whose node bbox
        holds none of the remaining candidates. Each visit is
        vectorized over its candidate set; with no internal level
        (few polygons) every leaf gets the full point set — the
        pre-round-5 linear behavior."""
        all_idx = np.arange(len(px), dtype=np.int64)
        if not self.inner_levels:
            for li in range(len(self.leaves)):
                yield li, all_idx
            return
        top = len(self.inner_levels) - 1
        n_roots = len(self.inner_levels[top][0])
        stack = [(top, i, all_idx) for i in range(n_roots)]
        while stack:
            lvl, node, idx = stack.pop()
            mnx, mxx, mny, mxy, starts, ends = self.inner_levels[lvl]
            m = ((px[idx] >= mnx[node]) & (px[idx] <= mxx[node]) &
                 (py[idx] >= mny[node]) & (py[idx] <= mxy[node]))
            if not m.any():
                continue
            idx2 = idx[m]
            for child in range(starts[node], ends[node]):
                if lvl == 0:
                    yield int(child), idx2
                else:
                    stack.append((lvl - 1, int(child), idx2))

    def assign(self, px: np.ndarray, py: np.ndarray):
        """Deepest-level containing polygon per point.

        Returns (admin_id, admin_level, cc_list) with -1 / None for
        points outside every polygon.
        """
        n = len(px)
        best_level = np.full(n, -1, dtype=np.int64)
        best_id = np.full(n, -1, dtype=np.int64)
        self.last_leaf_visits = 0
        for li, cand in self._candidate_leaves(px, py):
            m = ((px[cand] >= self.leaf_min_x[li]) &
                 (px[cand] <= self.leaf_max_x[li]) &
                 (py[cand] >= self.leaf_min_y[li]) &
                 (py[cand] <= self.leaf_max_y[li]))
            if not m.any():
                continue
            self.last_leaf_visits += 1
            idx = cand[m]
            for poly in self.leaves[li]:
                pm = ((px[idx] >= self.bb_min_x[poly]) & (px[idx] <= self.bb_max_x[poly]) &
                      (py[idx] >= self.bb_min_y[poly]) & (py[idx] <= self.bb_max_y[poly]))
                if not pm.any():
                    continue
                cidx = idx[pm]
                hit = self.contains(int(poly), px[cidx], py[cidx])
                if not hit.any():
                    continue
                h = cidx[hit]
                lvl = int(self.admin_level[poly])
                aid = int(self.admin_id[poly])
                better = (lvl > best_level[h]) | ((lvl == best_level[h]) &
                                                  ((best_id[h] < 0) | (aid < best_id[h])))
                upd = h[better]
                best_level[upd] = lvl
                best_id[upd] = aid
        cc = [None] * n
        id_to_cc = {int(a): c for a, c in zip(self.admin_id, self.cc)}
        for i in np.nonzero(best_id >= 0)[0]:
            cc[i] = id_to_cc[int(best_id[i])]
        return best_id, best_level, cc


class PIPJoin:
    """map_batches actor stage: append admin assignment of each row's
    (lon_col, lat_col) point. Null coordinates -> null assignment.
    """

    def __init__(self, polygons, lon_col: str = "best_long", lat_col: str = "best_lat"):
        import ray

        idx = ray.get(polygons) if isinstance(polygons, ray.ObjectRef) else polygons
        if isinstance(idx, pa.Table):
            idx = PolygonIndex(idx)
        self.index: PolygonIndex = idx
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = np.asarray(batch[self.lon_col].to_numpy(zero_copy_only=False), dtype=np.float64)
        lat = np.asarray(batch[self.lat_col].to_numpy(zero_copy_only=False), dtype=np.float64)
        ok = ~(np.isnan(lon) | np.isnan(lat))
        admin_id = np.full(len(lon), -1, dtype=np.int64)
        admin_level = np.full(len(lon), -1, dtype=np.int64)
        cc_out = [None] * len(lon)
        if ok.any():
            ids, levels, ccs = self.index.assign(lon[ok], lat[ok])
            pos = np.nonzero(ok)[0]
            admin_id[pos] = ids
            admin_level[pos] = levels
            for p, c in zip(pos, ccs):
                cc_out[p] = c
        batch = batch.append_column(
            "admin_id", pa.array(np.where(admin_id >= 0, admin_id, -1), pa.int64(),
                                 from_pandas=False))
        batch = batch.append_column(
            "admin_level", pa.array(admin_level, pa.int64()))
        batch = batch.append_column("admin_cc", pa.array(cc_out, pa.string()))
        return batch
