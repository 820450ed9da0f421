"""The flagship extraction pipeline.

    read_parquet (pruned columns)
      → map_batches(synthesize)           # deterministic CC-style corpus
      → map_batches(sniff)                # doc_type / size_class / partition_id
      → map_batches(extract)              # DOM strip | PDF parse; explode to pages
      → map_batches(OcrEngine, actors)    # fill OCR-routed pages
      → groupby(partition_id).map_groups  # dedup + combine  (the ONE shuffle)

Everything up to the groupby is map-only and streams with backpressure;
the single all-to-all exchange moves extracted *text* (pages table,
``ocr_payload`` already dropped), never raw payloads. At 100 TB input
that is the difference between shuffling ~100 TB of HTML/PDF bytes and
~10 TB of text.

Skew: the parse stage uses a small ``batch_size`` (docs per task) so a
multi-hundred-page PDF bounds one task, not a 4096-doc block; pages are
exploded immediately after parse so downstream stages work on pages.
"""

from __future__ import annotations

import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..sources.synth import synthesize_batch
from ..stages.combine import make_finalizer
from ..stages.extract import make_extractor
from ..stages.ocr import OcrEngine
from ..stages.sniff import make_sniffer


def read_documents(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )


def synthesize_docs(sf_dir: str) -> ray.data.Dataset:
    """The Common-Crawl-style input table as a (lazy, distributed) Dataset."""
    return read_documents(sf_dir).map_batches(
        synthesize_batch, batch_format="pyarrow", batch_size=512
    )


def pages_pipeline(
    docs: ray.data.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """docs table -> per-page table with OCR applied (map-only, no shuffle)."""
    ds = docs.map_batches(
        make_sniffer(cfg), batch_format="pyarrow", batch_size=cfg.sniff_batch_size
    )
    ds = ds.map_batches(
        make_extractor(cfg), batch_format="pyarrow", batch_size=cfg.extract_batch_size
    )
    ds = ds.map_batches(
        OcrEngine,
        fn_constructor_kwargs={"engine": "stub"},
        batch_format="pyarrow",
        batch_size=cfg.ocr_batch_size,
        concurrency=cfg.ocr_concurrency,
    )
    return ds


def extract_pipeline(
    docs: ray.data.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """docs table -> extracted table (one row per url)."""
    pages = pages_pipeline(docs, cfg)
    finalize = make_finalizer(cfg.page_separator, cfg.combine_order)
    return pages.groupby("partition_id").map_groups(
        finalize, batch_format="pandas"
    )


def run_extraction(
    sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    return extract_pipeline(synthesize_docs(sf_dir), cfg)
