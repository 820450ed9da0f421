#!/usr/bin/env python
"""Per-stage Ray Data stats for the flagship extraction pipeline.

Prints ``Dataset.stats()`` after a full run — wall time, CPU time,
rows and block sizes per operator — the feedback loop used to size
batch sizes, block counts and actor pools (ARCHITECTURE.md "Sizing
rules discovered by measurement"). Owns its Ray session.

    python tools/stage_stats.py [sf_dir] [repeat]
"""

from __future__ import annotations

import logging
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            log_to_driver=False,
            logging_level=logging.ERROR,
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from pdf_to_text_ray.pipelines.extract import run_extraction

    # materialize: count() alone executes a derived AggregateNumRows
    # plan and leaves the original dataset's stats empty
    ds = run_extraction(sf_dir, repeat=repeat).materialize()
    print(f"rows: {ds.count()}")
    print(ds.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
