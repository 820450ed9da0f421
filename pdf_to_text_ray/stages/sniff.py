"""Byte-sniffer / router stage.

Fast, allocation-light routing on payload prefixes — the engine
analogue of the reference's per-image digital/handwritten classifier
(classify_image_type.py:5-43) and text-layer probe (1_pdf_to_image/
gg.py:5-14), generalized to web payloads per the north star: ``%PDF-``
magic → pdf; HTML markers in the first 256 bytes → html; else unknown.

Also derives the scale metadata every later stage keys on:
``n_bytes`` (vectorized ``pyarrow.compute``), ``size_class`` (skew
bucketing — multi-hundred-page PDFs must not share batches with tweets)
and ``partition_id`` (md5(url) % P — deterministic checkpoint/resume
key independent of cluster size, SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..functions.hashing import stable_u64

_HTML_MARKERS = (b"<!doctype", b"<html", b"<head", b"<body", b"<div", b"<p>", b"<article")


def sniff_payload(payload: bytes) -> str:
    """Classify one payload by its first bytes."""
    if payload is None:
        return "unknown"
    head = payload[:256].lstrip()
    if head.startswith(b"%PDF-"):
        return "pdf"
    low = head.lower()
    if any(m in low for m in _HTML_MARKERS):
        return "html"
    return "unknown"


def make_sniffer(cfg: PipelineConfig):
    """Build the map_batches body (pyarrow in / pyarrow out)."""
    bounds = np.array([cfg.size_small, cfg.size_medium, cfg.size_large])
    classes = np.array(["s", "m", "l", "xl"])
    num_partitions = cfg.num_partitions

    def sniff_batch(batch: pa.Table) -> pa.Table:
        payloads = batch["html"]
        doc_type = pa.array(
            [sniff_payload(p) for p in payloads.to_pylist()], pa.string()
        )
        n_bytes = pc.cast(pc.binary_length(payloads), pa.int64())
        size_class = pa.array(
            classes[np.searchsorted(bounds, n_bytes.to_numpy(), side="right")],
            pa.string(),
        )
        pid = pa.array(
            [stable_u64(u) % num_partitions for u in batch["url"].to_pylist()],
            pa.int32(),
        )
        out = batch.drop_columns(["text"])  # crawl text not needed downstream
        out = out.append_column("doc_type", doc_type)
        out = out.append_column("n_bytes", n_bytes)
        out = out.append_column("size_class", size_class)
        out = out.append_column("partition_id", pid)
        return out

    return sniff_batch
