"""The bench's weather gate must ACT on the gauge (VERDICT r3 #2):
retry a timed section until the memcpy probe reads healthy, run the
last attempt regardless, and report section health truthfully."""

import importlib.util
import os


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_timed_section_retries_until_healthy(monkeypatch):
    bench = _load_bench()
    readings = iter([0.2, 0.4, 7.5])  # healthy on the 3rd probe

    monkeypatch.setattr(bench, "weather_gauge",
                        lambda: {"memcpy_gbps": next(readings)})
    monkeypatch.setattr(bench, "WEATHER_SETTLE_SEC", 0)
    calls = []
    res, ok = bench.timed_section(lambda: calls.append(1) or "run",
                                  attempts=5)
    assert (res, ok) == ("run", True)
    assert calls == [1]  # the section ran ONCE, in the healthy window


def test_timed_section_runs_last_attempt_unhealthy(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "weather_gauge",
                        lambda: {"memcpy_gbps": 0.1})
    monkeypatch.setattr(bench, "WEATHER_SETTLE_SEC", 0)
    res, ok = bench.timed_section(lambda: "run", attempts=3)
    assert (res, ok) == ("run", False)  # record exists, stamped unhealthy


def test_stats_summary_parses_ray_249_format():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    canned = """Operator 1 ReadParquet->MapBatches(_fused_task_fn): 96 tasks executed, 96 blocks produced in 3.21s
* Remote wall time: 1.46ms min, 9.87ms max, 5.25ms mean, 42.0ms total
* UDF time: 26.43us min, 162.9us max, 88.14us mean, 2.75s total
* Output num rows per block: 12500 min, 12500 max, 12500 mean, 100000 total

Operator 2 Sort: 4 tasks executed, 4 blocks produced in 850ms
* UDF time: 1us min, 2us max, 1.5us mean, 705.14us total

Dataset throughput:
\t* Ray Data throughput: 186468.59 rows/s
"""
    got = bench.stats_summary(canned)
    assert got == [
        {"op": "ReadParquet->MapBatches(_fused_task_fn)",
         "wall_s": 3.21, "udf_s": 2.75},
        {"op": "Sort", "wall_s": 0.85, "udf_s": 0.001},
    ]
    assert bench.stats_summary(None) == []
    assert bench.stats_summary("garbage\nlines") == []
