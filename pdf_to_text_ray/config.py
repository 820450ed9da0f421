"""Pipeline configuration.

Mirrors the reference's tunables (dpi / chunk_size / top_k kwargs —
see SURVEY.md §2.10) plus the engine-new scale knobs (partition count,
batch sizes, actor-pool sizes).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- routing (reference semantics) ---
    # Strict > threshold on whitespace-stripped page-text length
    # (reference: core_document_processing.py:73-76).
    text_layer_threshold: int = 250

    # --- partitioning / checkpoint ---
    # Deterministic partition id = md5(url) % num_partitions; independent of
    # cluster size / num_blocks so resume survives parallelism changes
    # (SURVEY.md §7 hard part 5). At 100 TB you'd raise this to ~10^5.
    num_partitions: int = 64

    # --- skew handling ---
    # size_class boundaries on payload bytes. The class feeds metrics /
    # grouped stats (queries.q_size_class_counts); skew itself is
    # handled by dynamic block-byte splitting + the page explode right
    # after parse (tests/test_skew.py pins a 300-page PDF flowing
    # through mixed batches without stalling them).
    size_small: int = 8 * 1024
    size_medium: int = 64 * 1024
    size_large: int = 1024 * 1024

    # --- stage sizing (shuffle-path pages pipeline only) ---
    # The broadcast path uses batch_size=None (whole blocks; task
    # granularity = read num_blocks). In the shuffle path the fused
    # chain bundles inputs at the chain's MAX batch_size — a large value
    # here caps pipeline parallelism (5000 rows / 4096 = 2 tasks!), so
    # every fused stage shares the same small docs-per-task batch. Skew
    # from huge docs is bounded by block BYTES (dynamic block splitting
    # at DataContext.target_max_block_size), not row counts.
    sniff_batch_size: int = 64
    extract_batch_size: int = 64  # docs per parse batch (heavy stage -> small)
    ocr_batch_size: int = 64  # pages per OCR batch
    # OCR actor-pool size. None -> autoscaling (1, cluster CPUs): Ray
    # fuses the upstream stateless stages into this actor pool, so a
    # fixed small pool would cap the WHOLE pipeline's parallelism.
    ocr_concurrency: int | tuple | None = None

    # --- dedup strategy ---
    # "broadcast": pruned-column pre-pass computes the winner ts per
    #   re-crawled url, broadcast via ray.put; extraction is then fully
    #   map-only (no payload/page shuffle). Right when the duplicate-url
    #   set fits in memory (re-crawls are a few % of a crawl).
    # "shuffle": groupby(partition_id) dedup+combine — the general path
    #   for unbounded duplicate sets.
    dedup_mode: str = "broadcast"
    # Byte budget for droplist driver/broadcast state. The broadcast
    # path degrades in two bounded steps past it: distributed groupby
    # merge (driver sees re-crawled urls only), then automatic fallback
    # to the shuffle pipeline (see pipelines/extract.stale_droplist).
    droplist_budget_bytes: int = 256 * 1024 * 1024

    # --- combine semantics ---
    # "numeric" sorts pages by page_no (core_document_generator.py:157-185);
    # "lex" reproduces the reference's lexicographic filename-sort quirk
    # (combine_texts.py:20 -> page_1, page_10, page_11, ..., page_2).
    combine_order: str = "numeric"
    # Separator between pages when reassembling a document. The synthetic
    # corpus paginates on word boundaries, so a single space reconstructs
    # the source text byte-exactly (the per-url byte-identity contract);
    # reference-style header separators are exposed by stages/combine.py
    # (combine_page_headers / combine_reference_lex).
    page_separator: str = " "

    # --- output ---
    output_dir: str | None = None  # when set, run_checkpointed writes here

    extra: dict = field(default_factory=dict)


DEFAULT_CONFIG = PipelineConfig()
