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

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Sum

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..sources.synth import synthesize_batch, synthesize_keys_batch
from ..stages.combine import make_finalizer
from ..stages.extract import make_doc_extractor, make_extractor
from ..stages.ocr import OcrEngine
from ..stages.sniff import make_sniffer


MIN_ROWS_PER_BLOCK = 256


def auto_num_blocks(parquet_path: str, repeat: int = 1) -> int:
    """Block count for a pruned read: 4x cluster CPUs (tasks outnumber
    cores enough for balance) CAPPED so each block keeps at least
    ``MIN_ROWS_PER_BLOCK`` source rows — per-task overhead dominates
    below that (measured at sf0.1: 128 blocks of 39 docs ran 4x slower
    than 16 blocks of 312). Row count comes from parquet footer
    metadata (no data read); at real scale the cap never binds."""
    try:
        target = 4 * int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        target = 32
    try:
        import pyarrow.parquet as pq

        rows = pq.ParquetFile(parquet_path).metadata.num_rows * max(1, repeat)
        return max(1, min(target, rows // MIN_ROWS_PER_BLOCK or 1))
    except Exception:
        return target


def read_documents(
    sf_dir: str, num_blocks: int | None = None, repeat: int = 1
) -> ray.data.Dataset:
    """Pruned-column read; see :func:`auto_num_blocks` for sizing."""
    path = f"{sf_dir}/documents.parquet"
    if num_blocks is None:
        num_blocks = auto_num_blocks(path, repeat)
    return ray.data.read_parquet(
        path,
        columns=["doc_id", "text", "lang"],
        override_num_blocks=num_blocks,
    )


def synthesize_docs(sf_dir: str, repeat: int = 1) -> ray.data.Dataset:
    """The Common-Crawl-style input table as a (lazy, distributed) Dataset.

    ``repeat`` > 1 amplifies the corpus deterministically (each source
    row yields ``repeat`` distinct urls) — used by the scaling bench to
    give the pipeline enough work to measure steady-state throughput.
    """
    # batch_size=None processes one whole block per call: task
    # granularity is controlled solely by read_documents' num_blocks,
    # and each stage call stays fully vectorized.
    return read_documents(sf_dir, repeat=repeat).map_batches(
        synthesize_batch,
        fn_kwargs={"repeat": repeat},
        batch_format="pyarrow",
        batch_size=None,
    )


def _pool_size(cfg: PipelineConfig):
    """Actor-pool sizing for the fused extract+OCR stage: the upstream
    stateless maps fuse into this pool, so it must scale with the
    cluster, not a constant."""
    if cfg.ocr_concurrency is not None:
        return cfg.ocr_concurrency
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (1, max(2, cpus))


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
        concurrency=_pool_size(cfg),
    )
    return ds


def extract_pipeline(
    docs: ray.data.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Shuffle-path extraction: docs -> pages -> groupby(partition_id)
    -> dedup + combine. The general path — works for corpora whose
    duplicate-url set doesn't fit in a broadcast."""
    pages = pages_pipeline(docs, cfg)
    finalize = make_finalizer(cfg.page_separator, cfg.combine_order)
    return pages.groupby("partition_id").map_groups(
        finalize, batch_format="pandas"
    )


# ------------------------- broadcast-dedup, map-only path (default) --


def synthesize_keys(sf_dir: str, repeat: int = 1) -> ray.data.Dataset:
    """Pruned pre-pass: just (url, ts_us) crawl keys. On a real corpus
    this is ``read_parquet(columns=["url", "warc_ts"])`` — only two tiny
    columns leave storage, ~10^3x less bytes than the payload scan."""
    path = f"{sf_dir}/documents.parquet"
    return ray.data.read_parquet(
        path,
        columns=["doc_id"],
        override_num_blocks=auto_num_blocks(path, repeat),
    ).map_batches(
        synthesize_keys_batch,
        fn_kwargs={"repeat": repeat},
        batch_format="pyarrow",
        batch_size=None,
    )


def _partial_key_agg(batch: pa.Table) -> pa.Table:
    """Map-side combiner: one (url, max_ts, n) row per url per batch
    (pure pyarrow C++ group-by)."""
    g = pa.TableGroupBy(batch, "url").aggregate(
        [("ts_us", "max"), ("ts_us", "count")]
    )
    return pa.table(
        {
            "url": g["url"],
            "max_ts": g["ts_us_max"],
            "n": pc.cast(g["ts_us_count"], pa.int64()),
        }
    )


class DroplistBudgetExceeded(RuntimeError):
    """The re-crawled-url droplist itself exceeds the broadcast byte
    budget — the caller must fall back to ``dedup_mode="shuffle"``."""


# Default byte budget for driver-side droplist state. 256 MiB of
# (url, ts, n) rows ≈ ~3M distinct urls per partial sweep — far below
# driver RAM, far above any test corpus.
DROPLIST_BUDGET_BYTES = 256 * 1024 * 1024


def _droplist_from_dup_tables(tables, byte_budget: int) -> dict[str, int]:
    if not tables:
        return {}
    if sum(t.nbytes for t in tables) > byte_budget:
        raise DroplistBudgetExceeded(
            "re-crawled-url droplist exceeds the broadcast budget; "
            "use cfg.dedup_mode='shuffle'"
        )
    dup = pa.concat_tables(tables)
    return dict(zip(dup["url"].to_pylist(), dup["ts"].to_pylist()))


def _stale_droplist_shuffled(
    partials: ray.data.Dataset, byte_budget: int
) -> dict[str, int]:
    """Ray-side merge: one distributed groupby reduces the partials to
    RE-CRAWLED urls only before anything reaches the driver — driver
    memory is O(re-crawled urls), not O(all urls)."""
    merged = partials.groupby("url").aggregate(
        Max("max_ts", alias_name="ts"),
        Sum("n", alias_name="n_total"),
    )

    def only_dups(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.greater(t["n_total"], 1))
        return keep.select(["url", "ts"])

    dup_tables = [
        t
        for t in ray.get(
            merged.map_batches(only_dups, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    return _droplist_from_dup_tables(dup_tables, byte_budget)


def stale_droplist(
    keys: ray.data.Dataset, byte_budget: int = DROPLIST_BUDGET_BYTES
) -> dict[str, int]:
    """url -> winning ts_us, ONLY for urls crawled more than once.

    Shape: map-side partial aggregation (one row per url per block),
    merged driver-side with one multithreaded pyarrow C++ group-by —
    Ray's sort-based groupby shuffle costs seconds of fixed latency that
    this one-column merge doesn't need. The driver merge is BOUNDED:
    partial blocks are fetched until their cumulative bytes hit
    ``byte_budget``; past that the merge degrades to a distributed Ray
    groupby that reduces to re-crawled urls before anything reaches the
    driver. If even the re-crawled set busts the budget,
    :class:`DroplistBudgetExceeded` tells the caller to use
    ``dedup_mode="shuffle"`` (run_extraction does this automatically).
    The returned broadcast dict is proportional to the RE-CRAWLED url
    count only (typically a few %% of a crawl).
    """
    # materialized so the budget-overflow fallback reuses the executed
    # blocks instead of re-running the whole key scan (partials are
    # tiny url/ts/n rows, object-store resident)
    partials = keys.map_batches(
        _partial_key_agg, batch_format="pyarrow", batch_size=None
    ).materialize()
    tables, total = [], 0
    for ref in partials.to_arrow_refs():
        t = ray.get(ref)
        if not t.num_rows:
            continue
        tables.append(t)
        total += t.nbytes
        if total > byte_budget:
            # cumulative partials bust the budget -> distributed merge
            return _stale_droplist_shuffled(partials, byte_budget)
    if not tables:
        return {}
    merged = pa.TableGroupBy(
        pa.concat_tables(tables).combine_chunks(), "url"
    ).aggregate([("max_ts", "max"), ("n", "sum")])
    dup = merged.filter(pc.greater(merged["n_sum"], 1))
    dup = pa.table({"url": dup["url"], "ts": dup["max_ts_max"]})
    return _droplist_from_dup_tables([dup] if dup.num_rows else [], byte_budget)


from ..functions.broadcast import cached_get as _get_broadcast  # noqa: E402


def make_stale_filter(dups_ref):
    """Drop crawls older than their url's winner (broadcast lookup).

    The broadcast is a pair of parallel sorted numpy arrays
    (urls, winning_ts) so the per-batch check is one ``searchsorted``
    + vectorized compares — no per-row Python membership loop.
    """

    def stale_filter(batch: pa.Table) -> pa.Table:
        import numpy as np

        dup_urls, dup_ts = _get_broadcast(dups_ref)
        if len(dup_urls) == 0:
            return batch
        urls = np.asarray(batch["url"].to_pylist(), dtype=object)
        ts = pc.cast(batch["warc_ts"], pa.int64()).to_numpy()
        idx = np.searchsorted(dup_urls, urls)
        idx_c = np.minimum(idx, len(dup_urls) - 1)
        found = dup_urls[idx_c] == urls
        keep = ~found | (ts == dup_ts[idx_c])
        if keep.all():
            return batch
        return batch.filter(pa.array(keep, pa.bool_()))

    return stale_filter


def droplist_arrays(dups: dict[str, int]):
    """dict url->ts -> (sorted url array, parallel ts array) for the
    vectorized stale filter broadcast."""
    import numpy as np

    if not dups:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    urls = np.asarray(sorted(dups), dtype=object)
    ts = np.fromiter((dups[u] for u in urls), dtype=np.int64, count=len(urls))
    return urls, ts


def extract_pipeline_broadcast(
    docs: ray.data.Dataset,
    dups: dict[str, int],
    cfg: PipelineConfig = DEFAULT_CONFIG,
    pre_extract=None,
) -> ray.data.Dataset:
    """Map-only extraction: sniff -> broadcast stale filter (stale
    crawls never reach the parser) -> fused parse+OCR+combine. No
    shuffle touches payload or page text.

    ``pre_extract``: optional batch filter applied before the parser
    (the checkpoint resume filter plugs in here so completed
    partitions' docs are never parsed).
    """
    ds = docs.map_batches(
        make_sniffer(cfg), batch_format="pyarrow", batch_size=None
    )
    if dups:
        ds = ds.map_batches(
            make_stale_filter(ray.put(droplist_arrays(dups))),
            batch_format="pyarrow",
            batch_size=None,
        )
    if pre_extract is not None:
        ds = ds.map_batches(
            pre_extract, batch_format="pyarrow", batch_size=None
        )
    return ds.map_batches(
        make_doc_extractor(cfg),
        batch_format="pyarrow",
        batch_size=None,
    )


def run_extraction_on(
    docs: ray.data.Dataset,
    keys,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """Extraction over an arbitrary crawl-table Dataset (parquet- or
    WARC-sourced). ``keys`` is a zero-arg thunk returning the pruned
    (url, ts_us) Dataset for the droplist pre-pass — a thunk so the
    shuffle mode (and the budget-overflow fallback) never builds it."""
    if cfg.dedup_mode == "shuffle":
        return extract_pipeline(docs, cfg)
    try:
        dups = stale_droplist(keys(), cfg.droplist_budget_bytes)
    except DroplistBudgetExceeded:
        # even the re-crawled-url set is too big to broadcast — the
        # general shuffle path has no such bound
        return extract_pipeline(docs, cfg)
    return extract_pipeline_broadcast(docs, dups, cfg)


def run_extraction(
    sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG, repeat: int = 1
) -> ray.data.Dataset:
    return run_extraction_on(
        synthesize_docs(sf_dir, repeat),
        lambda: synthesize_keys(sf_dir, repeat),
        cfg,
    )
