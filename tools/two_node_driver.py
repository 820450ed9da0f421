"""Driver for tools/two_node_smoke.sh: attaches to an ALREADY RUNNING
two-raylet Ray cluster (head + one `ray start --address=` worker — two
object stores, so block handoff crosses the object-manager transfer
path exactly as it would between machines) and proves the flagship
pipeline actually executes on BOTH nodes:

- tags every extraction batch with the executing node id,
- asserts >= 2 distinct node ids over the run,
- runs one all-to-all exchange (the hourly-bucket groupby) so shuffle
  blocks also cross nodes,
- checks the row count against the known sf corpus size.

This is the sandbox stand-in for the north rule's multi-node `ray job
submit` run (no dashboard packages -> no Job API); the cluster-attach
code path is the one a submitted job's driver executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pyarrow as pa

import ray
import ray.data


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    ray.init(address="auto", logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    nodes_alive = [n for n in ray.nodes() if n["Alive"]]
    print(f"# cluster nodes alive: {len(nodes_alive)}")
    if len(nodes_alive) < 2:
        print("FAIL: expected a 2-node cluster (head + worker)")
        return 1

    from pdf_to_text_ray.pipelines.extract import run_extraction

    def tag_node(batch: pa.Table) -> pa.Table:
        nid = ray.get_runtime_context().get_node_id()
        return batch.append_column(
            "exec_node", pa.array([nid] * batch.num_rows, pa.string())
        )

    # repartition BEFORE tagging: at sf0.001 the read is 1-2 blocks
    # and Ray would happily run them on one raylet; 16 blocks across
    # 2x4 CPUs forces tasks (and their input blocks) onto both nodes
    ds = (
        run_extraction(sf_dir)
        .repartition(16)
        .map_batches(tag_node, batch_format="pyarrow", num_cpus=2)
    )
    # one all-to-all exchange so shuffle blocks also cross nodes
    hourly = ds.groupby("doc_type").count().take_all()
    node_ids = {
        r["exec_node"]
        for r in ds.select_columns(["exec_node"]).take_all()
    }
    n_rows = ds.count()
    print(f"# extraction rows: {n_rows}; doc_type groups: {len(hourly)}")
    print(f"# distinct executing nodes: {len(node_ids)}")
    if n_rows <= 0:
        print("FAIL: empty extraction result")
        return 1
    if len(node_ids) < 2:
        print(
            "FAIL: all batches ran on one node — no cross-node execution"
        )
        return 1
    print("two-node smoke OK: pipeline spanned both raylets")
    return 0


if __name__ == "__main__":
    rc = main()
    ray.shutdown()
    sys.exit(rc)
