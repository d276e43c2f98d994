"""Mention resolution + vetting + wide projection — vectorized.

Semantics ported (NOT code) from the reference:

  * per-source top-N ranking       — reference keeps the first
    ``results_per_app`` results per service in API order
    (query_funcs.py:376,428,455,494). Offline deterministic analogue:
    distinct gazetteer entries per (page, source) ranked by
    population DESC, gazetteer_id ASC.
  * country filter                 — candidates restricted to the
    page's country prior; a candidate with NO country code is KEPT
    (the reference's OSM keep-unsure rule, query_funcs.py:411-422).
  * vetting + composite best      — WebGeocodingManager.vet
    (query_funcs.py:193-219): drop each result whose bbox-diagonal
    buffer exceeds ``max_buffer``; pool ALL surviving results' points
    (bbox entries contribute their two corners, point entries one
    point); if the pooled bbox diagonal is itself <= max_buffer, emit a
    composite ``best`` with name 'Vetted' and type
    'Composite of {n} geocoded locations'.
  * wide output                   — ``{prefix}_{suffix}`` columns with
    prefix order = case-insensitive sort with 'best' first
    (batch_geocode.py:29-38) and suffixes
    ['name','type','lat','long','buffer'] (utilities.py:42-45); absent
    combinations are null (the reference's reindex-NaN columns), and
    the intermediate bb_n/bb_s/bb_e/bb_w never reach the output.

Everything below is NumPy over flattened Arrow list columns — there is
no per-row Python in this stage. Rows keep their original ``{source}{rank}``
key even when a higher-ranked result is vetted out (the reference nulls
GM1 but keeps GM2's key, it does not renumber).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from batch_geocode_ray.config import GEOCODING_SUFFIXES, PipelineConfig
from batch_geocode_ray.functions.geo import diag_buffer_km
from batch_geocode_ray.state.gazetteer import GazetteerIndex


class MentionResolver:
    """Actor-pool stage: mentions -> vetted wide geocode columns.

    ``lang_cc_prior``: optional dict lang -> frozenset of ISO2 codes; a
    candidate passes when its cc is missing, the page lang has no
    prior, or cc ∈ prior[lang]. None disables the country filter.
    """

    def __init__(self, gazetteer, config: PipelineConfig | None = None,
                 lang_cc_prior: dict[str, frozenset[str]] | None = None,
                 keep_columns: list[str] | None = None,
                 drop_mentions: bool = True):
        import ray

        gaz = ray.get(gazetteer) if isinstance(gazetteer, ray.ObjectRef) else gazetteer
        if isinstance(gaz, pa.Table):
            gaz = GazetteerIndex.from_table(gaz)
        self.gaz: GazetteerIndex = gaz
        self.cfg = config or PipelineConfig(sources=gaz.sources)
        self.keep_columns = keep_columns
        self.drop_mentions = drop_mentions
        self.entry_of_gid = gaz.entry_of_gid()
        self.gid_lookup_keys = np.array(sorted(self.entry_of_gid), dtype=np.int64)
        self.gid_lookup_vals = np.array(
            [self.entry_of_gid[k] for k in self.gid_lookup_keys], dtype=np.int64)

        # cc prior as a dense bool matrix (n_langs x n_ccs)
        if lang_cc_prior is None:
            self.prior_langs = None
        else:
            self.prior_langs = sorted(lang_cc_prior)
            self.prior_matrix = np.zeros((len(self.prior_langs), len(gaz.cc_vocab)), dtype=bool)
            cc_pos = {c: i for i, c in enumerate(gaz.cc_vocab)}
            for li, lang in enumerate(self.prior_langs):
                for cc in lang_cc_prior[lang]:
                    if cc in cc_pos:
                        self.prior_matrix[li, cc_pos[cc]] = True

        # Static wide layout: prefixes from config (sources x ranks +
        # best), ordered exactly like reference batch_geocode.py:29-34.
        cfg = self.cfg
        self.prefixes = cfg.wide_prefixes()
        # map (source_idx, rank) -> prefix string
        self.source_rank_prefix = {
            (si, r): f"{s}{r + 1}"
            for si, s in enumerate(gaz.sources)
            for r in range(cfg.results_per_app)
        }

    # ------------------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        gaz = self.gaz
        cfg = self.cfg
        n = batch.num_rows

        mentions = batch["mentions"].combine_chunks()
        flat = mentions.flatten()
        row_of_mention = np.asarray(mentions.value_parent_indices())
        gids = np.asarray(flat.field("gazetteer_id"))

        # gazetteer_id -> dense entry index
        pos = np.searchsorted(self.gid_lookup_keys, gids)
        entry = self.gid_lookup_vals[np.clip(pos, 0, len(self.gid_lookup_vals) - 1)]

        # distinct (row, entry): many occurrences of one place on a page
        # resolve to one candidate (reference: one API result per place)
        key = row_of_mention.astype(np.int64) * np.int64(len(gaz.ids) + 1) + entry
        uniq_key = np.unique(key)
        row_idx = (uniq_key // np.int64(len(gaz.ids) + 1)).astype(np.int64)
        cand = (uniq_key % np.int64(len(gaz.ids) + 1)).astype(np.int64)

        # --- country filter (J2)
        if self.prior_langs is not None and n > 0:
            langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [None] * n
            lang_idx = np.array(
                [self.prior_langs.index(l) if l in self.prior_langs else -1 for l in langs],
                dtype=np.int64,
            )
            cand_cc = gaz.cc_code[cand]
            li = lang_idx[row_idx]
            keep = (cand_cc < 0) | (li < 0)
            both = (~keep)
            keep[both] = self.prior_matrix[li[both], cand_cc[both]]
            row_idx, cand = row_idx[keep], cand[keep]

        # --- per-(row, source) top-N rank: population DESC, gid ASC
        src = gaz.source_idx[cand].astype(np.int64)
        order = np.lexsort((gaz.ids[cand], -gaz.population[cand], src, row_idx))
        row_s, src_s, cand_s = row_idx[order], src[order], cand[order]
        new_group = np.ones(len(order), dtype=bool)
        if len(order) > 1:
            new_group[1:] = (row_s[1:] != row_s[:-1]) | (src_s[1:] != src_s[:-1])
        group_start = np.maximum.accumulate(np.where(new_group, np.arange(len(order)), 0))
        rank = np.arange(len(order)) - group_start
        top = rank < cfg.results_per_app
        row_t, src_t, cand_t, rank_t = row_s[top], src_s[top], cand_s[top], rank[top]

        # --- vet: drop candidates whose own buffer exceeds max_buffer
        buf_t = gaz.buffer_km[cand_t]
        valid = buf_t <= cfg.max_buffer

        # --- pooled composite best over surviving candidates' POINTS
        min_lon_e, min_lat_e, max_lon_e, max_lat_e = gaz.bbox_arrays()
        v_cand = cand_t[valid]
        v_row = row_t[valid]
        has_box = ~np.isnan(gaz.bb_n[v_cand])
        # point contributions to the pooled centroid: bbox entries = the
        # two corners, point entries = the point (reference pools raw
        # points_list then nanmean / min / max, query_funcs.py:211-217)
        p_min_lon = np.full(n, np.inf); p_min_lat = np.full(n, np.inf)
        p_max_lon = np.full(n, -np.inf); p_max_lat = np.full(n, -np.inf)
        sum_lon = np.zeros(n); sum_lat = np.zeros(n); n_pts = np.zeros(n)
        np.minimum.at(p_min_lon, v_row, min_lon_e[v_cand])
        np.minimum.at(p_min_lat, v_row, min_lat_e[v_cand])
        np.maximum.at(p_max_lon, v_row, max_lon_e[v_cand])
        np.maximum.at(p_max_lat, v_row, max_lat_e[v_cand])
        corner_lon_sum = np.where(has_box, min_lon_e[v_cand] + max_lon_e[v_cand],
                                  gaz.lon[v_cand])
        corner_lat_sum = np.where(has_box, min_lat_e[v_cand] + max_lat_e[v_cand],
                                  gaz.lat[v_cand])
        np.add.at(sum_lon, v_row, corner_lon_sum)
        np.add.at(sum_lat, v_row, corner_lat_sum)
        np.add.at(n_pts, v_row, np.where(has_box, 2.0, 1.0))
        num_valid = np.zeros(n, dtype=np.int64)
        np.add.at(num_valid, v_row, 1)

        with np.errstate(invalid="ignore", divide="ignore"):
            best_lon = np.where(n_pts > 0, sum_lon / np.maximum(n_pts, 1), np.nan)
            best_lat = np.where(n_pts > 0, sum_lat / np.maximum(n_pts, 1), np.nan)
        pooled_buffer = np.full(n, np.nan)
        pooled_rows = n_pts > 0
        pooled_buffer[pooled_rows] = diag_buffer_km(
            p_min_lon[pooled_rows], p_min_lat[pooled_rows],
            p_max_lon[pooled_rows], p_max_lat[pooled_rows])
        best_mask = pooled_rows & (pooled_buffer <= cfg.max_buffer)

        # --- wide scatter
        out_cols: dict[str, pa.Array] = {}
        # candidate centroid: bbox entries -> bbox centroid (= mean of the
        # two corners); point entries -> the point
        cand_centroid_lon = np.where(~np.isnan(gaz.bb_n), (gaz.bb_w + gaz.bb_e) / 2.0, gaz.lon)
        cand_centroid_lat = np.where(~np.isnan(gaz.bb_n), (gaz.bb_s + gaz.bb_n) / 2.0, gaz.lat)
        names_arr = np.array(gaz.names, dtype=object)
        types_arr = np.array(gaz.types, dtype=object)

        for (si, r), prefix in self.source_rank_prefix.items():
            m = (src_t == si) & (rank_t == r) & valid
            rows = row_t[m]
            c = cand_t[m]
            name_col = np.full(n, None, dtype=object)
            type_col = np.full(n, None, dtype=object)
            lat_col = np.full(n, np.nan)
            lon_col = np.full(n, np.nan)
            buf_col = np.full(n, np.nan)
            name_col[rows] = names_arr[c]
            type_col[rows] = types_arr[c]
            lat_col[rows] = cand_centroid_lat[c]
            lon_col[rows] = cand_centroid_lon[c]
            buf_col[rows] = gaz.buffer_km[c]
            out_cols[f"{prefix}_name"] = pa.array(name_col, pa.string())
            out_cols[f"{prefix}_type"] = pa.array(type_col, pa.string())
            out_cols[f"{prefix}_lat"] = _masked_f64(lat_col)
            out_cols[f"{prefix}_long"] = _masked_f64(lon_col)
            out_cols[f"{prefix}_buffer"] = _masked_f64(buf_col)

        best_name = np.full(n, None, dtype=object)
        best_type = np.full(n, None, dtype=object)
        best_name[best_mask] = "Vetted"
        # vectorized format: num_valid takes a handful of distinct small
        # values, so format each ONCE and scatter by index (the naive
        # per-row f-string was the last per-row Python in the hot path)
        nv = num_valid[best_mask]
        if len(nv):
            uniq, inv = np.unique(nv, return_inverse=True)
            strs = np.array([f"Composite of {int(v)} geocoded locations"
                             for v in uniq], dtype=object)
            best_type[best_mask] = strs[inv]
        out_cols["best_name"] = pa.array(best_name, pa.string())
        out_cols["best_type"] = pa.array(best_type, pa.string())
        out_cols["best_lat"] = _masked_f64(np.where(best_mask, best_lat, np.nan))
        out_cols["best_long"] = _masked_f64(np.where(best_mask, best_lon, np.nan))
        out_cols["best_buffer"] = _masked_f64(np.where(best_mask, pooled_buffer, np.nan))

        # assemble: passthrough columns + wide columns in reference order
        keep = self.keep_columns
        if keep is None:
            keep = [c for c in batch.column_names
                    if c != "mentions" or not self.drop_mentions]
        result = {c: batch[c] for c in keep}
        for prefix in self.prefixes:
            for suffix in GEOCODING_SUFFIXES:
                col = f"{prefix}_{suffix}"
                result[col] = out_cols.get(col, _null_col(n, suffix))
        return pa.table(result)


def _masked_f64(values: np.ndarray) -> pa.Array:
    return pa.array(values, pa.float64(), from_pandas=True)  # NaN -> null


def _null_col(n: int, suffix: str) -> pa.Array:
    typ = pa.string() if suffix in ("name", "type") else pa.float64()
    return pa.nulls(n, typ)
