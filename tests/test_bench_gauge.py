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
