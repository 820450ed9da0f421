"""Small-file compaction for parquet directories.

Long checkpointed runs and per-block `write_parquet` sinks leave many
small files; at cluster scale the file count itself becomes the
bottleneck (listing, footer reads, task-per-file scheduling). This
rewrites a directory into ~``target_bytes``-sized files with a single
streaming read → repartition → write — no driver materialization.

The output file count is sized from the on-disk (compressed) byte
sizes of the input files — a directory listing, no data read. Only
``*.parquet`` files are read: checkpoint dirs legitimately hold json
sidecars (lineage/, meta.json) that must not reach the parquet reader.
"""

from __future__ import annotations

import os

import ray
import ray.data

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def plan_compaction(in_dir: str, target_bytes: int = DEFAULT_TARGET_BYTES):
    """-> (parquet file list, total on-disk bytes, n_output_files)."""
    files = sorted(
        os.path.join(root, f)
        for root, _, names in os.walk(in_dir)
        for f in names
        if f.endswith(".parquet")
    )
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_bytes))
    # never "compact" into more files than we started with
    n_out = min(n_out, max(1, len(files)))
    return files, total, n_out


def compact_parquet(
    in_dir: str,
    out_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Stream-compact the parquet files under ``in_dir`` into
    ``out_dir``; returns stats. Refuses a non-empty ``out_dir``
    (write_parquet appends — a rerun would duplicate rows)."""
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise ValueError(f"output dir {out_dir!r} is not empty")
    files, total, n_out = plan_compaction(in_dir, target_bytes)
    if not files:
        raise ValueError(f"no parquet files under {in_dir!r}")
    # read exactly the planned files — read_parquet(in_dir) would also
    # try to parse sidecars (lineage/*.json, meta.json) and crash
    ds = ray.data.read_parquet(files)
    ds.repartition(n_out).write_parquet(out_dir)
    written = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    return {
        "input_files": len(files),
        "input_bytes": total,
        "output_files": len(written),
        "rows": ray.data.read_parquet(out_dir).count(),
    }
