"""Per-partition lineage + checkpoint/resume (SURVEY §4, north rule:
"resumable from checkpoint with per-partition lineage + metrics").

Partition identity derives from the INPUT (file list hash + partition
index), never from Ray task ids — Ray's block assignment is
non-deterministic, input sharding is not. Each completed partition
leaves two artifacts next to each other:

    part-{pid:05d}/           parquet output of that partition
    part-{pid:05d}.lineage.json   input files, row counts in/out,
                                  attempt count, wall seconds, bytes,
                                  pipeline fingerprint

Resume = skip every partition whose lineage exists, matches the current
(input, pipeline) fingerprint, and whose output row count re-verifies.
A crashed run therefore re-does only unfinished partitions; a changed
pipeline or input invalidates the fingerprint and re-runs everything.

Each partition is one bounded Dataset execution (fully parallel across
the cluster internally); partitions run in sequence on the driver. On
the 10^12-doc job a partition is a WARC-crawl-sized slice (hundreds of
files), so the outer loop is shallow while each iteration saturates the
cluster.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass

import pyarrow.parquet as pq

from ray.data import Dataset


def _fingerprint(files: list[str], pipeline_tag: str) -> str:
    h = hashlib.sha256()
    h.update(pipeline_tag.encode())
    for f in sorted(files):
        h.update(f.encode())
        h.update(str(os.path.getsize(f)).encode())
    return h.hexdigest()[:16]


def plan_partitions(input_files: list[str], files_per_partition: int) -> list[list[str]]:
    """Deterministic partitioning of the input file list (sorted, then
    chunked) — identical across runs regardless of cluster state."""
    files = sorted(input_files)
    return [files[i:i + files_per_partition]
            for i in range(0, len(files), files_per_partition)]


@dataclass
class PartitionResult:
    pid: int
    skipped: bool
    rows_out: int
    wall_s: float
    attempt: int


def run_resumable(build_fn: Callable[[list[str]], Dataset],
                  input_files: list[str],
                  out_dir: str,
                  pipeline_tag: str,
                  files_per_partition: int = 1) -> list[PartitionResult]:
    """Execute ``build_fn(partition_files) -> Dataset`` per partition,
    writing partitioned parquet + lineage; completed partitions are
    skipped on re-run.

    ``pipeline_tag`` should change whenever pipeline semantics change
    (e.g. a version string + config hash) so stale checkpoints never
    masquerade as current output.
    """
    os.makedirs(out_dir, exist_ok=True)
    results: list[PartitionResult] = []
    for pid, files in enumerate(plan_partitions(input_files, files_per_partition)):
        part_dir = os.path.join(out_dir, f"part-{pid:05d}")
        lineage_path = os.path.join(out_dir, f"part-{pid:05d}.lineage.json")
        fp = _fingerprint(files, pipeline_tag)

        prev_attempt = 0
        if os.path.exists(lineage_path):
            try:
                with open(lineage_path) as f:
                    lin = json.load(f)
                prev_attempt = int(lin.get("attempt", 0))
                if lin.get("fingerprint") == fp and os.path.isdir(part_dir):
                    actual = _count_rows(part_dir)
                    if actual == lin.get("rows_out"):
                        results.append(PartitionResult(
                            pid, True, actual, 0.0, prev_attempt))
                        continue
            except (json.JSONDecodeError, OSError):
                pass  # corrupt lineage -> recompute

        t0 = time.perf_counter()
        ds = build_fn(files)
        rows_in = sum(pq.read_metadata(f).num_rows for f in files)
        # clean any partial previous output before rewriting
        if os.path.isdir(part_dir):
            for f in os.listdir(part_dir):
                os.unlink(os.path.join(part_dir, f))
        ds.write_parquet(part_dir)
        wall = time.perf_counter() - t0
        rows_out = _count_rows(part_dir)
        bytes_out = sum(
            os.path.getsize(os.path.join(part_dir, f))
            for f in os.listdir(part_dir))
        lineage = {
            "partition": pid,
            "fingerprint": fp,
            "input_files": files,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "bytes_out": bytes_out,
            "wall_s": round(wall, 3),
            "attempt": prev_attempt + 1,
            "pipeline_tag": pipeline_tag,
        }
        tmp = lineage_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(lineage, f, indent=1)
        os.replace(tmp, lineage_path)  # atomic: lineage appears only complete
        results.append(PartitionResult(pid, False, rows_out, wall,
                                       prev_attempt + 1))
    return results


def _count_rows(part_dir: str) -> int:
    total = 0
    for f in os.listdir(part_dir):
        if f.endswith(".parquet"):
            total += pq.read_metadata(os.path.join(part_dir, f)).num_rows
    return total


def load_lineage(out_dir: str) -> list[dict]:
    """All lineage records in partition order (the run's metrics feed)."""
    out = []
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".lineage.json"):
            with open(os.path.join(out_dir, name)) as f:
                out.append(json.load(f))
    return out
