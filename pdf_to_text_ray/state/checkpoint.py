"""Per-partition checkpointed output with lineage sidecars.

Layout (``cfg.output_dir``)::

    partitions/part-00017.parquet   # extracted rows of partition 17
    lineage/part-00017.json         # counters + wall time for partition 17

Invariants (SURVEY.md §7 hard part 5 / north rule "resumable from
checkpoint with per-partition lineage + metrics"):

* partition_id = md5(url) % cfg.num_partitions — a pure function of the
  row, independent of cluster size, block layout, or execution order,
  so a resume at different parallelism sees identical partition
  boundaries.
* Writes are atomic (tmp file + ``os.replace``); the lineage sidecar is
  written strictly AFTER the data file, so "lineage exists" ⇒ the data
  file is complete. A partition with data but no lineage is treated as
  failed and recomputed.
* Resume = filter already-completed partition ids out right after the
  sniff stage — completed partitions are never re-parsed (the filter is
  a vectorized Arrow mask, the skipped docs never reach the heavy
  stages).

On a multi-node cluster ``output_dir`` is shared storage (NFS / object
store URI); map_groups tasks write their own partition from whichever
node runs them — no driver-side funnel.
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..config import PipelineConfig


META_NAME = "meta.json"


def _meta_of(cfg: PipelineConfig) -> dict:
    return {
        "num_partitions": cfg.num_partitions,
        "page_separator": cfg.page_separator,
        "combine_order": cfg.combine_order,
    }


def check_or_write_meta(cfg: PipelineConfig) -> None:
    """Pin the partition layout of an output_dir. A resume whose config
    disagrees with the meta written on first run would silently mix
    partition layouts (duplicated/missing documents) — fail fast
    instead."""
    if not cfg.output_dir:
        raise ValueError("cfg.output_dir is required for checkpointed runs")
    path = os.path.join(cfg.output_dir, META_NAME)
    meta = _meta_of(cfg)
    if os.path.exists(path):
        existing = json.load(open(path))
        if existing != meta:
            raise ValueError(
                f"resume config mismatch for {cfg.output_dir}: written "
                f"with {existing}, current config is {meta}; resume with "
                "the original settings or use a fresh output_dir"
            )
        return
    _atomic_write(path, lambda p: open(p, "w").write(json.dumps(meta)))


def _part_name(pid: int) -> str:
    return f"part-{pid:05d}"


def data_path(output_dir: str, pid: int) -> str:
    return os.path.join(output_dir, "partitions", _part_name(pid) + ".parquet")


def lineage_path(output_dir: str, pid: int) -> str:
    return os.path.join(output_dir, "lineage", _part_name(pid) + ".json")


def completed_partitions(output_dir: str) -> set[int]:
    """Partition ids whose lineage sidecar exists (⇒ data complete)."""
    lin_dir = os.path.join(output_dir, "lineage")
    if not os.path.isdir(lin_dir):
        return set()
    done = set()
    for name in os.listdir(lin_dir):
        if name.startswith("part-") and name.endswith(".json"):
            pid = int(name[len("part-"):-len(".json")])
            if os.path.exists(data_path(output_dir, pid)):
                done.add(pid)
    return done


def _atomic_write(path: str, write_fn) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    write_fn(tmp)
    os.replace(tmp, path)


def make_partition_writer(cfg: PipelineConfig):
    """map_groups body: write one partition's extracted rows and its
    lineage sidecar atomically, return the lineage row."""
    output_dir = cfg.output_dir
    if not output_dir:
        raise ValueError("cfg.output_dir is required for checkpointed runs")

    def write_partition(extracted: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter()
        pid = int(extracted["partition_id"].iloc[0])
        extracted = extracted.sort_values("url", kind="mergesort")
        table = pa.Table.from_pandas(extracted, preserve_index=False)
        _atomic_write(
            data_path(output_dir, pid), lambda p: pq.write_table(table, p)
        )
        routes = [r for rs in extracted["routes"] for r in rs]
        lineage = {
            "partition_id": pid,
            "urls": int(len(extracted)),
            "docs_ok": int(extracted["parse_ok"].sum()),
            "docs_failed": int((~extracted["parse_ok"]).sum()),
            "chars_out": int(extracted["n_chars"].sum()),
            "route_dom": routes.count("dom"),
            "route_text_layer": routes.count("text_layer"),
            "route_ocr": routes.count("ocr"),
            "wall_s": round(time.perf_counter() - t0, 6),
        }
        _atomic_write(
            lineage_path(output_dir, pid),
            lambda p: open(p, "w").write(json.dumps(lineage)),
        )
        return pd.DataFrame([lineage])

    return write_partition


def resume_filter(done: set[int]):
    """Vectorized Arrow mask dropping rows of completed partitions."""
    done_arr = pa.array(sorted(done), pa.int32())

    def fn(batch: pa.Table) -> pa.Table:
        mask = pa.compute.invert(
            pa.compute.is_in(batch["partition_id"], value_set=done_arr)
        )
        return batch.filter(mask)

    return fn


def run_checkpointed(
    docs: ray.data.Dataset, cfg: PipelineConfig, dups: dict | None = None
) -> dict:
    """Run the extraction pipeline with per-partition checkpointing.

    The resume filter runs right after the sniff stage inside the
    map-only extraction, so completed partitions' docs are never parsed;
    the groupby then shuffles only extracted doc rows (payloads and page
    rasters are long gone).

    Returns {"lineage": DataFrame, "skipped": n, "computed": n}.
    """
    from ..pipelines.extract import extract_pipeline_broadcast

    check_or_write_meta(cfg)
    done = completed_partitions(cfg.output_dir)
    extracted = extract_pipeline_broadcast(
        docs,
        dups if dups is not None else {},
        cfg,
        pre_extract=resume_filter(done) if done else None,
    )
    lineage_ds = extracted.groupby("partition_id").map_groups(
        make_partition_writer(cfg), batch_format="pandas"
    )
    lineage = lineage_ds.to_pandas()  # ≤ num_partitions rows — tiny
    return {
        "lineage": lineage,
        "skipped": len(done),
        "computed": len(lineage),
    }


def read_extracted(output_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(output_dir, "partitions"))
