"""The flagship end-to-end pipeline (SURVEY §3.4):

    read_parquet(pages)
      -> extract_text (stateless, drops html early)
      -> GazetteerMatcher (actor pool, broadcast automaton)
      -> MentionResolver (actor pool, vet + wide columns)
      -> cell encode (stateless: s2_cell + h3-style hex res 7/8/9)
      -> PIPJoin (actor pool, broadcast STRtree)
      -> [optional] KNNFacilities (actor pool, broadcast index)
      -> forks: page-level parquet / tile aggregates

All pipeline builders are lazy — they return Datasets; the caller
consumes (write_parquet / iter_batches / to_pandas on small results).
None of them call ray.init().
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data import Dataset

from batch_geocode_ray.config import PipelineConfig
from batch_geocode_ray.functions.cells import hex_cell, s2_cell
from batch_geocode_ray.sources.fixtures import LANG_CC_PRIOR
from batch_geocode_ray.stages.aggregates import tile_aggregate
from batch_geocode_ray.stages.extract import extract_text_stage
from batch_geocode_ray.stages.knn import FacilityIndex, KNNFacilities
from batch_geocode_ray.stages.matcher import GazetteerMatcher
from batch_geocode_ray.stages.pip import PIPJoin, PolygonIndex
from batch_geocode_ray.stages.resolve import MentionResolver
from batch_geocode_ray.state.gazetteer import GazetteerIndex


def encode_cells_stage(batch: pa.Table, resolutions=(7, 8, 9), s2_level: int = 12,
                       lon_col: str = "best_long", lat_col: str = "best_lat") -> pa.Table:
    """Stateless cell encoding of the vetted best point; rows without a
    best point get null cells."""
    lon = np.asarray(batch[lon_col].to_numpy(zero_copy_only=False), dtype=np.float64)
    lat = np.asarray(batch[lat_col].to_numpy(zero_copy_only=False), dtype=np.float64)
    ok = ~(np.isnan(lon) | np.isnan(lat))
    safe_lon = np.where(ok, lon, 0.0)
    safe_lat = np.where(ok, lat, 0.0)
    for res in resolutions:
        cells = hex_cell(safe_lon, safe_lat, res).astype(np.int64)
        batch = batch.append_column(
            f"hex_cell_r{res}",
            pa.array(np.where(ok, cells, 0), pa.int64(), mask=~ok))
    s2 = s2_cell(safe_lon, safe_lat, s2_level).astype(np.int64)
    batch = batch.append_column("s2_cell", pa.array(np.where(ok, s2, 0), pa.int64(), mask=~ok))
    return batch


class GeocodeFusedStage:
    """ONE actor-pool stage running the whole per-page chain:
    extract -> match -> resolve/vet -> cells -> PIP -> kNN.

    Fusing matters for throughput: with four separate actor pools the
    streaming executor juggles five operators and none reaches high
    occupancy (measured ~4x parallelism on 32 CPUs); one pool sized to
    the cluster gets near-linear scaling. The unfused stages remain for
    composability/tests; semantics are identical (the fused __call__
    just chains the same callables).
    """

    def __init__(self, gazetteer, config: PipelineConfig,
                 lang_cc_prior=None, polygons=None, facilities=None,
                 verify_extraction: bool = False, with_knn: bool = False,
                 keep_columns: list[str] | None = None):
        self.cfg = config
        self.verify_extraction = verify_extraction
        self.matcher = GazetteerMatcher(gazetteer)
        self.resolver = MentionResolver(
            self.matcher.gaz, config=config, lang_cc_prior=lang_cc_prior,
            keep_columns=keep_columns or ["url", "warc_ts", "lang"])
        self.pip = PIPJoin(polygons) if polygons is not None else None
        # grid probe: vectorized per-cell candidate rings with exact
        # brute-force fallback — same output as brute force (pinned in
        # tests), measured 0.5 vs 9.8 us/page at F=1000
        self.knn = (KNNFacilities(facilities, k=config.knn_k, use_grid=True)
                    if with_knn and facilities is not None else None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = extract_text_stage(batch, verify_against_input=self.verify_extraction)
        b = self.matcher(b)
        b = self.resolver(b)
        b = encode_cells_stage(b, self.cfg.hex_resolutions, self.cfg.s2_level)
        if self.pip is not None:
            b = self.pip(b)
        if self.knn is not None:
            b = self.knn(b)
        return b


def _fused_pool_size() -> int:
    """Actor-pool size for the fused stage: most of the cluster, leaving
    headroom for read tasks + driver."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, cpus - 2)


def _read_num_blocks(paths) -> int | None:
    """Read-block count for the page table: Ray's default plan for
    many-small-file inputs lands on tiny blocks (one or two per file),
    and the fused stage then runs hundreds of ~200ms tasks whose fixed
    overheads cost ~2x throughput at 32 CPUs (measured 154k -> 345k
    pages/s at 960k pages by coarsening 384 -> 96 blocks). Target
    ~32 MB per block with a floor of 3 tasks/CPU so every core still
    gets several waves; None (Ray's default) when the input size can't
    be cheaply known (remote storage globs)."""
    import os

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    try:
        total = 0
        for p in ([paths] if isinstance(paths, str) else list(paths)):
            if os.path.isdir(p):
                for e in os.scandir(p):
                    total += e.stat().st_size
            elif os.path.isfile(p):
                total += os.path.getsize(p)
            else:
                return None
        if total <= 0:
            return None
    except OSError:
        return None
    blocks = total // (32 << 20)
    if blocks >= 3 * cpus:
        return blocks
    # Small input: the 3-tasks/CPU floor would slice it into sub-MB
    # blocks whose fixed task overhead dominates (measured q22 at 30k
    # pages/14MB: 96 blocks ran 1.6s vs ~0.9s at ~1MB blocks). Keep
    # blocks >= ~1MB; tiny inputs then run fewer-but-meatier tasks.
    return max(1, min(3 * cpus, total // (1 << 20)))


# Per-worker soft-state cache for the task-mode fused stage. Ray worker
# processes persist across tasks, so the state (automaton, R-tree,
# facility index) builds ONCE per worker on first touch — same
# amortization as an actor pool, but the stage runs in the pre-started
# task pool and reaches full cluster parallelism instantly (a fixed
# 30-actor pool measured ~10s of spin-up, dominating short runs:
# 960k pages ran 15.4s under actors vs 4.2s under cached tasks).
_FUSED_STATE_CACHE: dict = {}

# stateful_mode="auto" memory model: task mode keeps ONE built-state
# copy in EVERY worker process that ever runs the stage — up to
# cluster-CPUs copies (32 workers x a 2 GB gazetteer = 64 GB of heap).
# Actor mode caps residency at the pool size and amortizes its ~10 s
# spin-up over the long runs a huge state implies. Auto picks actor
# once the broadcast inputs (gazetteer + polygons + facilities tables,
# a lower bound on built-state size) exceed this threshold.
AUTO_ACTOR_STATE_BYTES = 1 << 30


def _resolve_stateful_mode(mode: str, gazetteer: pa.Table,
                           admin_polygons: pa.Table | None,
                           facilities: pa.Table | None) -> str:
    """``"auto"`` -> "task" below :data:`AUTO_ACTOR_STATE_BYTES` of
    broadcast-input bytes, "actor" at/above; explicit modes pass
    through. Both physical plans are value-identical
    (tests/test_fused_stage.py)."""
    if mode != "auto":
        return mode
    state = gazetteer.nbytes
    if admin_polygons is not None:
        state += admin_polygons.nbytes
    if facilities is not None:
        state += facilities.nbytes
    return "actor" if state >= AUTO_ACTOR_STATE_BYTES else "task"


def _fused_task_fn(batch: pa.Table, *, cache_key, gazetteer, config,
                   lang_cc_prior, polygons, facilities,
                   verify_extraction, with_knn) -> pa.Table:
    stage = _FUSED_STATE_CACHE.get(cache_key)
    if stage is None:
        stage = GeocodeFusedStage(
            gazetteer, config, lang_cc_prior=lang_cc_prior,
            polygons=polygons, facilities=facilities,
            verify_extraction=verify_extraction, with_knn=with_knn)
        _FUSED_STATE_CACHE[cache_key] = stage
    return stage(batch)


def build_geocode_pipeline(pages_path: str | list[str],
                           gazetteer: pa.Table,
                           admin_polygons: pa.Table | None = None,
                           facilities: pa.Table | None = None,
                           cfg: PipelineConfig | None = None,
                           lang_cc_prior=None,
                           verify_extraction: bool = False,
                           with_knn: bool = False,
                           fused: bool = True,
                           stateful_mode: str = "auto") -> Dataset:
    """Page-level geocode Dataset: url/lang + wide geocode columns +
    cells + admin assignment (+ optional kNN).

    ``fused=True`` (default) runs the whole per-page chain in one
    stage; ``fused=False`` keeps one operator per stage (per-stage
    stats, tests). ``stateful_mode`` picks the fused stage's physical
    plan: ``"task"`` caches the built state per worker process —
    instant full-cluster parallelism, right whenever the state fits
    comfortably in every worker; ``"actor"`` uses an explicit actor
    pool — the right plan when the broadcast state is huge (multi-GB
    gazetteers) and you want pool-controlled memory residency instead
    of one copy per worker. ``"auto"`` (default) picks by measured
    broadcast-state size (:func:`_resolve_stateful_mode`,
    threshold :data:`AUTO_ACTOR_STATE_BYTES`)."""
    gaz_index = GazetteerIndex.from_table(gazetteer)
    cfg = cfg or PipelineConfig(sources=gaz_index.sources)
    if lang_cc_prior is None:
        lang_cc_prior = LANG_CC_PRIOR
    gaz_ref = ray.put(gaz_index)

    # prune at the read: the oracle `text` column is recomputed from
    # `html` and only needed when verifying extraction — skipping it
    # cuts ~30% of input decode + object-store bytes
    read_cols = None
    try:
        import glob as _glob
        import os as _os

        import pyarrow.parquet as _pq

        first = pages_path if isinstance(pages_path, str) else pages_path[0]
        if _os.path.isdir(first):
            first = sorted(_glob.glob(_os.path.join(first, "*.parquet")))[0]
        names = _pq.read_schema(first).names
        if "text" in names and not verify_extraction:
            read_cols = [c for c in names if c != "text"]
    except (OSError, IndexError):
        pass
    ds = rd.read_parquet(pages_path, columns=read_cols,
                         override_num_blocks=_read_num_blocks(pages_path))

    if fused:
        stateful_mode = _resolve_stateful_mode(
            stateful_mode, gazetteer, admin_polygons,
            facilities if with_knn else None)
        poly_ref = (ray.put(PolygonIndex(admin_polygons))
                    if admin_polygons is not None else None)
        fac_ref = (ray.put(FacilityIndex(facilities))
                   if with_knn and facilities is not None else None)
        kwargs = {
            "gazetteer": gaz_ref,
            "config": cfg,
            "lang_cc_prior": lang_cc_prior,
            "polygons": poly_ref,
            "facilities": fac_ref,
            "verify_extraction": verify_extraction,
            "with_knn": with_knn,
        }
        if stateful_mode == "task":
            cache_key = (gaz_ref, poly_ref, fac_ref, verify_extraction,
                         with_knn, cfg.results_per_app, cfg.max_buffer,
                         tuple(cfg.hex_resolutions), cfg.s2_level)
            return ds.map_batches(
                _fused_task_fn,
                fn_kwargs={"cache_key": cache_key, **kwargs},
                batch_format="pyarrow",
                batch_size=cfg.fused_batch_size,
            )
        return ds.map_batches(
            GeocodeFusedStage,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=_fused_pool_size(),
            num_cpus=1,
        )

    ds = ds.map_batches(
        lambda b: extract_text_stage(b, verify_against_input=verify_extraction),
        batch_format="pyarrow",
    )
    ds = ds.map_batches(
        GazetteerMatcher,
        fn_constructor_kwargs={"gazetteer": gaz_ref},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.matcher_concurrency,
        num_cpus=cfg.actor_num_cpus,
    )
    ds = ds.map_batches(
        MentionResolver,
        fn_constructor_kwargs={
            "gazetteer": gaz_ref,
            "config": cfg,
            "lang_cc_prior": lang_cc_prior,
            "keep_columns": ["url", "warc_ts", "lang"],
        },
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.matcher_concurrency,
        num_cpus=cfg.actor_num_cpus,
    )
    ds = ds.map_batches(
        lambda b: encode_cells_stage(b, cfg.hex_resolutions, cfg.s2_level),
        batch_format="pyarrow",
    )
    if admin_polygons is not None:
        poly_ref = ray.put(PolygonIndex(admin_polygons))
        ds = ds.map_batches(
            PIPJoin,
            fn_constructor_kwargs={"polygons": poly_ref},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=cfg.pip_concurrency,
            num_cpus=cfg.actor_num_cpus,
        )
    if with_knn and facilities is not None:
        fac_ref = ray.put(FacilityIndex(facilities))
        ds = ds.map_batches(
            KNNFacilities,
            fn_constructor_kwargs={"facilities": fac_ref, "k": cfg.knn_k},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=cfg.pip_concurrency,
            num_cpus=cfg.actor_num_cpus,
        )
    return ds


def build_tile_aggregates(page_ds: Dataset, res: int = 7,
                          merge: str = "shuffle") -> Dataset:
    """Choropleth tile stats per hex cell at ``res``, sorted by cell for
    deterministic golden output. ``merge="single"`` for small tile
    counts (skips the Aggregate+Sort all-to-all ops)."""
    import pyarrow.compute as pc

    cell_col = f"hex_cell_r{res}"
    with_cell = page_ds.map_batches(
        lambda b: b.filter(pc.is_valid(b[cell_col])), batch_format="pyarrow")
    out = tile_aggregate(with_cell, cell_col, merge=merge)
    return out if merge == "single" else out.sort(cell_col)
