"""Checkpoint/resume determinism (SURVEY §5.4): interrupt, resume, and
byte-compare against an uninterrupted run."""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from batch_geocode_ray.state.checkpoint import (
    load_lineage,
    plan_partitions,
    run_resumable,
)


@pytest.fixture()
def inputs(tmp_path):
    files = []
    for i in range(4):
        t = pa.table({
            "x": pa.array(range(i * 10, i * 10 + 10), pa.int64()),
        })
        p = str(tmp_path / f"in-{i}.parquet")
        pq.write_table(t, p)
        files.append(p)
    return files


def build(files):
    import pyarrow.compute as pc
    import ray.data as rd

    return rd.read_parquet(files).map_batches(
        lambda b: b.append_column("y", pc.multiply(b["x"], 2)),
        batch_format="pyarrow")


def read_all(out_dir):
    rows = []
    for part in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, part)
        if os.path.isdir(d):
            for f in sorted(os.listdir(d)):
                rows.extend(pq.read_table(os.path.join(d, f)).to_pylist())
    return sorted(rows, key=lambda r: r["x"])


def test_plan_partitions_deterministic(inputs):
    a = plan_partitions(inputs, 2)
    b = plan_partitions(list(reversed(inputs)), 2)
    assert a == b
    assert len(a) == 2 and all(len(p) == 2 for p in a)


def test_run_and_resume(inputs, tmp_path):
    out1 = str(tmp_path / "run1")
    res = run_resumable(build, inputs, out1, "v1", files_per_partition=1)
    assert [r.skipped for r in res] == [False] * 4
    full = read_all(out1)
    assert len(full) == 40 and full[0]["y"] == 0

    # second call: everything skipped, nothing recomputed
    res2 = run_resumable(build, inputs, out1, "v1", files_per_partition=1)
    assert [r.skipped for r in res2] == [True] * 4

    # interrupt simulation: delete two partitions (+ one lineage)
    shutil.rmtree(os.path.join(out1, "part-00001"))
    os.unlink(os.path.join(out1, "part-00003.lineage.json"))
    res3 = run_resumable(build, inputs, out1, "v1", files_per_partition=1)
    assert [r.skipped for r in res3] == [True, False, True, False]
    assert read_all(out1) == full  # resumed == uninterrupted

    # attempt counters recorded
    lineage = load_lineage(out1)
    assert [l["attempt"] for l in lineage] == [1, 2, 1, 1]
    assert all(l["rows_in"] == 10 and l["rows_out"] == 10 for l in lineage)


def test_pipeline_tag_invalidates(inputs, tmp_path):
    out = str(tmp_path / "run")
    run_resumable(build, inputs, out, "v1", files_per_partition=2)
    res = run_resumable(build, inputs, out, "v2", files_per_partition=2)
    assert [r.skipped for r in res] == [False, False]  # tag change -> rerun


def test_midrun_failure_then_resume(inputs, tmp_path):
    """A crash mid-run (partition 2 raises) must leave partitions 0-1
    checkpointed; the retry completes only the unfinished ones and the
    final output equals an uninterrupted run."""
    out = str(tmp_path / "run")
    calls = {"n": 0}

    def flaky_build(files):
        calls["n"] += 1
        if calls["n"] == 3:  # third partition build crashes the driver
            raise RuntimeError("simulated crash")
        return build(files)

    with pytest.raises(RuntimeError):
        run_resumable(flaky_build, inputs, out, "v1", files_per_partition=1)
    done = [d for d in os.listdir(out) if d.endswith(".lineage.json")]
    assert len(done) == 2  # partitions 0 and 1 checkpointed

    res = run_resumable(build, inputs, out, "v1", files_per_partition=1)
    assert [r.skipped for r in res] == [True, True, False, False]
    assert len(read_all(out)) == 40


def test_corrupt_lineage_recovers(inputs, tmp_path):
    out = str(tmp_path / "run")
    run_resumable(build, inputs, out, "v1", files_per_partition=2)
    with open(os.path.join(out, "part-00000.lineage.json"), "w") as f:
        f.write("{not json")
    res = run_resumable(build, inputs, out, "v1", files_per_partition=2)
    assert [r.skipped for r in res] == [False, True]
    assert len(read_all(out)) == 40
