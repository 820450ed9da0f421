"""Attach to an ALREADY RUNNING Ray cluster (any raylet count) and time
the flagship extraction headline — the measurement leg of
tools/two_node_scaling.sh. Prints one JSON line:

    {"rows": N, "sec": S, "nodes": K, "cpus": C}

The cluster (not this driver) decides the topology, so the same code
measures a 1-raylet and a 2-raylet cluster — the sandbox's honest
stand-in for the north rule's two-cluster-size scaling criterion.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import ray
import ray.data


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    ray.init(address="auto", logging_level=logging.ERROR)

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    from pdf_to_text_ray.pipelines.extract import run_extraction

    nodes = len([n for n in ray.nodes() if n["Alive"]])
    cpus = int(ray.cluster_resources().get("CPU", 0))
    t0 = time.perf_counter()
    rows = run_extraction(sf_dir, repeat=repeat).count()
    sec = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "rows": rows,
                "sec": round(sec, 4),
                "nodes": nodes,
                "cpus": cpus,
            }
        )
    )
    return 0


if __name__ == "__main__":
    rc = main()
    ray.shutdown()
    sys.exit(rc)
