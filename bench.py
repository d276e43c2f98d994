"""Benchmark harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "pages_per_sec": ...}

--scaling: run the flagship geocode pipeline twice in FRESH processes
(num_cpus=8 then num_cpus=32) on identical input and report both
throughputs plus efficiency = (thr32 / thr8) / (32 / 8) — the sandbox
stand-in for the north rule's N vs 4N-node cluster comparison.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# The scaling comparison needs a run long enough that fixed overheads
# (actor spin-up, scheduling) amortize; the sf0.1-sized fixture finishes
# in seconds, so scaling mode uses a larger page count.
SCALING_PAGES = int(os.environ.get("BGR_SCALING_PAGES", "9600000"))

BENCH_QUERIES = [
    "q01_pricing_summary",      # scan + filter + grouped aggregate
    "q03_segment_revenue",      # broadcast join + aggregate
    "q08_user_event_stats",     # two-stage distinct aggregation
    "q12_dedup_exact",          # hash dedup shuffle
    "q15_ngram_dup_pairs",      # inverted-index similarity join
    "q16_embed_knn",            # brute-force cosine top-k
    "q18_minhash_neardup",      # MinHash LSH
    "q22_geocode_pages",        # flagship: extract->match->vet->cells->PIP->kNN
    "q23_tile_aggregates",      # flagship + salt-free two-stage tile agg
]


def _consume(res) -> int:
    """Force full execution; return row count."""
    from ray.data import Dataset

    if isinstance(res, Dataset):
        return sum(b.num_rows for b in res.iter_batches(batch_format="pyarrow"))
    return len(res)


def _sf_label(sf_dir: str) -> float:
    name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def _flagship_pages(sf_dir: str) -> int:
    name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return {"sf0.001": 300, "sf0.01": 3000, "sf0.1": 30000}.get(name, 300)


def run_suite(sf_dir: str, num_cpus: int, names: list[str]) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             log_to_driver=False)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from batch_geocode_ray import configure_for_throughput
    configure_for_throughput()
    from batch_geocode_ray.pipelines.queries import QUERIES

    # warm the page fixture (generation cost must not pollute timings)
    from batch_geocode_ray.pipelines.queries import _fixture_pages_for
    _fixture_pages_for(sf_dir)

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        t0 = time.perf_counter()
        rows[name] = _consume(QUERIES[name](sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {timings[name]:.2f}s rows={rows[name]}",
              file=sys.stderr, flush=True)
    ray.shutdown()
    return {"timings": timings, "rows": rows}


def main():
    if "--scaling" in sys.argv:
        # warm the (large) fixture once at full parallelism so neither
        # timed run pays generation cost
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--warm-fixture",
             "--pages", str(SCALING_PAGES)], check=True,
            capture_output=True, text=True)
        results = {}
        for cpus in (8, 32):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--single-flagship", "--cpus", str(cpus),
                 "--pages", str(SCALING_PAGES)],
                capture_output=True, text=True, check=True)
            results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
            print(f"cpus={cpus}: {results[cpus]}", file=sys.stderr)
        thr8 = results[8]["pages_per_sec"]
        thr32 = results[32]["pages_per_sec"]
        eff = (thr32 / thr8) / (32 / 8)
        print(json.dumps({
            "metric": "flagship geocode scaling efficiency (8 -> 32 cpus)",
            "value": round(eff, 3),
            "unit": "efficiency",
            "pages": SCALING_PAGES,
            "pages_per_sec_8": round(thr8, 1),
            "pages_per_sec_32": round(thr32, 1),
            "sec_8": results[8]["sec"],
            "sec_32": results[32]["sec"],
            "target": ">=0.8",
        }))
        return

    if "--warm-fixture" in sys.argv:
        n = int(sys.argv[sys.argv.index("--pages") + 1])
        import ray

        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 log_to_driver=False)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from batch_geocode_ray.sources.fixtures import ensure_fixture_dir
        ensure_fixture_dir(n)
        ray.shutdown()
        return

    if "--single-flagship" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        n_pages = int(sys.argv[sys.argv.index("--pages") + 1]) \
            if "--pages" in sys.argv else _flagship_pages(SF_DIR)
        import ray

        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 log_to_driver=False)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from batch_geocode_ray import configure_for_throughput
        configure_for_throughput()
        from batch_geocode_ray.pipelines.geocode import build_geocode_pipeline
        from batch_geocode_ray.sources.fixtures import (
            ensure_fixture_dir,
            generate_world,
        )
        d = ensure_fixture_dir(n_pages)  # cached; excluded from timing
        world = generate_world()
        out_dir = "/tmp/bgr_bench_out"
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        ds = build_geocode_pipeline(
            f"{d}/pages", world.gazetteer,
            admin_polygons=world.admin_polygons,
            facilities=world.facilities, with_knn=True)
        ds.write_parquet(out_dir)  # distributed sink — no driver drain
        sec = time.perf_counter() - t0
        import pyarrow.parquet as pq_

        n = sum(pq_.read_metadata(os.path.join(out_dir, f)).num_rows
                for f in os.listdir(out_dir) if f.endswith(".parquet"))
        ray.shutdown()
        print(json.dumps({"pages": n, "sec": round(sec, 3),
                          "pages_per_sec": round(n / sec, 2),
                          "num_cpus": cpus}))
        return

    res = run_suite(SF_DIR, NUM_CPUS, BENCH_QUERIES)
    total = round(sum(res["timings"].values()), 3)
    flagship_sec = res["timings"].get("q22_geocode_pages", 0.0)
    pages = _flagship_pages(SF_DIR)
    print(json.dumps({
        "metric": "end-to-end geocode+spatial-join pipeline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": res["timings"],
        "sf": _sf_label(SF_DIR),
        "num_cpus": NUM_CPUS,
        "pages_per_sec": round(pages / flagship_sec, 1) if flagship_sec else None,
    }))


if __name__ == "__main__":
    main()
