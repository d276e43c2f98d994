"""Pipeline configuration.

Mirrors the reference's tunables and their defaults:
  - ``results_per_app=2``  (reference geocode/query_funcs.py:94, CLI -r
    default 2 at batch_geocode.py:139-142)
  - ``max_buffer=15`` km   (query_funcs.py:94, CLI -b default at
    batch_geocode.py:143-149)
  - source list (reference ``execute=["GM","OSM","GN","FG"]``,
    query_funcs.py:93) becomes the list of gazetteer sources; each
    source contributes ``{source}{rank}`` prefixes to the wide output.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Suffixes kept in the final wide output (reference utilities.py:42-45,
# get_geocoding_suffixes). bb_n/bb_s/bb_e/bb_w are computed but dropped
# by the final projection, exactly like batch_geocode.py:38's reindex.
GEOCODING_SUFFIXES = ["name", "type", "lat", "long", "buffer"]

DEFAULT_SOURCES = ["GM", "OSM", "GN", "FG"]


@dataclass
class PipelineConfig:
    sources: list[str] = field(default_factory=lambda: list(DEFAULT_SOURCES))
    results_per_app: int = 2
    max_buffer: float = 15.0  # km, bbox-diagonal cutoff

    # Ray execution knobs. batch_size is rows per UDF invocation;
    # concurrency is the actor-pool size for stateful stages. On a real
    # cluster these scale with the node count; the streaming executor
    # handles backpressure either way.
    # Pool minimums stay at 1: with several actor-pool stages in one
    # pipeline, minimums that sum to the CPU count starve the read/task
    # stages and wedge the stream. Autoscaling grows pools under load.
    # Actor pools autoscale (min, max); maxima are set well above a
    # single node's CPU count so the pool — not the config — is the
    # binding constraint on a big cluster, while min=1 keeps small hosts
    # from starving (see actor_num_cpus below).
    batch_size: int = 2048
    # Fused task-mode stage: None = one batch per read block, which
    # lets Ray fuse ReadParquet->MapBatches->Write into ONE operator —
    # no intermediate object-store round trip (measured ~15% at 32
    # CPUs, and it is exactly the memory traffic the bandwidth-bound
    # 8->32 pair pays for). Block grain is set by _read_num_blocks
    # (~32 MB), so per-batch memory stays bounded.
    fused_batch_size: int | None = None
    matcher_concurrency: int | tuple[int, int] = (1, 64)
    pip_concurrency: int | tuple[int, int] = (1, 32)
    # Logical CPUs reserved per actor. Fractional on purpose: a pipeline
    # with several actor-pool stages at num_cpus=1 RESERVES min_pool x 1
    # CPU per stage, which on a small host starves the upstream read
    # task pool and wedges the stream (observed with 4 stages on 4
    # CPUs). 0.5 lets pools interleave; each actor is single-threaded
    # NumPy anyway, and the streaming executor's backpressure keeps real
    # utilization bounded.
    actor_num_cpus: float = 0.5

    # kNN
    knn_k: int = 3

    # Tile aggregation resolutions (H3-style res 7-9 per the north rule;
    # s2 level used for prefix repartitioning).
    hex_resolutions: tuple[int, ...] = (7, 8, 9)
    s2_level: int = 12

    def wide_prefixes(self) -> list[str]:
        """All result-key prefixes: ``{source}{rank}`` for every source and
        1-based rank (reference query_funcs.py:190-191) plus ``best``,
        ordered exactly like reference batch_geocode.py:29-34 — unique
        prefixes sorted case-insensitively, with 'best' prepended when
        absent.
        """
        prefixes = sorted(
            {f"{s}{i + 1}" for s in self.sources for i in range(self.results_per_app)},
            key=lambda s: s.lower(),
        )
        if "best" not in prefixes:
            prefixes = ["best"] + prefixes
        return prefixes

    def wide_columns(self) -> list[str]:
        return [f"{p}_{s}" for p in self.wide_prefixes() for s in GEOCODING_SUFFIXES]
