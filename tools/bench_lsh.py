#!/usr/bin/env python
"""lsh_topk vs ann_topk on an amplified embeddings table.

Evidence that the LSH-bucketed path actually SAVES compute (it skips
the matmul — and the embedding decode — for every row outside a query
bucket) rather than filtering after a full brute-force score.

Usage: python tools/bench_lsh.py [sf_dir] [repeat] [num_cpus] [n_queries]
Prints one JSON line with both wall times and the speedup. The saving
scales with the query count (routing is O(n*n_planes) either way; the
scoring matmul is O(n*Q) brute-force vs O(n*Q/2^n_planes) bucketed).
Owns its Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.compute as pc  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_queries = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    import ray
    import ray.data

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        log_to_driver=False,
        logging_level=logging.ERROR,
    )
    ray.data.DataContext.get_current().enable_progress_bars = False

    from pdf_to_text_ray.stages.similarity import ann_topk, lsh_topk

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    queries = {
        r["vec_id"]: r["embedding"]
        for r in t.to_pylist()
        if r["vec_id"] < n_queries
    }
    dim = len(next(iter(queries.values())))

    def candidates():
        ds = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )

        def amp(b: pa.Table) -> pa.Table:
            parts = []
            for r in range(repeat):
                parts.append(
                    pa.table(
                        {
                            "vec_id": pc.add(
                                b["vec_id"], pa.scalar(r * 10_000_000)
                            ),
                            "embedding": b["embedding"],
                        }
                    )
                )
            out = pa.concat_tables(parts)
            return out.filter(
                pc.greater_equal(out["vec_id"], pa.scalar(n_queries))
            )

        return ds.map_batches(amp, batch_format="pyarrow")

    # warm the worker pool so neither variant pays session startup
    ray.data.range(10_000).map_batches(lambda b: b).count()

    qref = ray.put({k: np.asarray(v) for k, v in queries.items()})
    t0 = time.perf_counter()
    n_ann = ann_topk(candidates(), qref, k=10).count()
    t_ann = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_lsh = lsh_topk(candidates(), qref, dim=dim, k=10, n_planes=4).count()
    t_lsh = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "lsh_topk vs ann_topk (amplified embeddings)",
                "n_queries": n_queries,
                "candidates_repeat": repeat,
                "num_cpus": num_cpus,
                "sf": sf_dir,
                "ann_sec": round(t_ann, 3),
                "lsh_sec": round(t_lsh, 3),
                "speedup": round(t_ann / t_lsh, 3),
                "ann_rows": n_ann,
                "lsh_rows": n_lsh,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
