#!/usr/bin/env python
"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR.

Default mode runs every benched query once under a single local Ray
session and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ..., "num_cpus": N,
     "docs_per_s": ...}

``--scaling`` runs the headline extraction pipeline twice in FRESH
processes (num_cpus=2 then num_cpus=8 by default — the sandbox
stand-in for N vs 4N nodes; see the --lo/--hi flag comment for why
those levels) on the same input and reports both throughputs plus
efficiency = thr_hi / (scale * thr_lo).

This script OWNS its Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# queries benched in default mode (headline first). Everything is
# consumed to completion via Dataset.count() after the final transform
# (which forces full execution of the lazy pipeline).
BENCH_QUERIES = [
    "extract_e2e",          # flagship: synth -> sniff -> extract -> OCR -> dedup -> combine
    # Dataset.join queries run EARLY: each join spawns a fresh
    # generation of shuffle ACTORS, and actor startup degrades with
    # the session's accumulated worker table (measured: 2.7-4.7 s in
    # a fresh session vs 34 s as query #20 of a 44-query run). Early
    # placement measures the operator, not Ray's session-age bloat.
    "join_orders_segment",
    "join_orders_segment_bcast",   # strategy gap vs the shuffle join
    "revenue_by_region",
    "pricing_summary",
    "parts_no_early_shipment",
    "supplier_revenue",
    "skyline",
    "weighted_avg_discount",
    "rollup_revenue",
    "cube_revenue",
    "order_priority_semi",
    "market_share",
    "nation_profit",
    "returned_revenue",
    "cust_order_dist",
    "small_qty_revenue",
    "lang_entropy",
    "supplier_part_counts",
    "large_orders",
    "idle_customers",
    "events_ewma",
    "last_event_value",
    "user_degree_hist",
    "pagerank",
    "extraction_metrics",
    "dedup_exact",
    "line_dedup",
    "minhash_near_dups",
    "simhash_near_dups",
    "token_stats",
    "heavy_hitter_words",
    "quality",
    "lang_percentiles",
    "lang_quantile_cont",
    "above_avg_docs",
    "supplier_wait_blame",
    "nation_pair_volume",
    "event_paths",
    "lang_source_chi2",
    "click_except_high_value",
    "winsorized_mean",
    "region_price_quantiles",
    "spearman_len_tokens",
    "activity_union",
    "time_to_purchase",
    "all_type_users",
    "cheapest_supplier_per_part",
    "char_budget_curation",
    "lineitem_profile",
    "nation_revenue_share",
    "top_docs_with_ties",
    "gini_by_priority",
    "cohort_retention",
    "ntile_quartiles",
    "cume_dist_lengths",
    "mad_lengths",
    "bpe_token_count",
    "pmi_top_pairs",
    "weighted_sample",
    "lang_id",
    "lang_confusion",
    "longest_doc_per_lang",
    "fingerprint",
    "hll_distinct",
    "domain_quality_gate",
    "bm25_topk",
    "ann_cosine_topk",
    "lsh_topk",
    "ivf_topk",
    "embedding_near_dups",
    "embedding_near_dups_lsh",
    "kmeans_clusters",
    "embedding_gram",
    "embedding_quantize",
    "events_hourly",
    "events_sliding",
    "events_sessionize",
    "events_asof_orders",
    "events_range_join",
    "events_running_total",
    "events_pivot",
    "events_gap_fill",
    "events_rolling_sum",
    "events_time_delta",
    "markov_transitions",
    "interval_coverage",
    "running_distinct",
    "funnel_conversion",
    "event_props",
    "route_counts",
    "domain_stats",
    "dup_clusters",
    "ngram_jaccard",
    "markdown_structure",
    "slide_windows",
    "markdown_report",
    "render_outputs",
    "summarize",
    "training_corpus",
    "text_windows",
    "train_val_split",
    "stratified_sample",
    "url_canonicalize",
    "decontaminate",
    "pack_sequences",
    "temperature_mix",
    "crawl_delta",
    "topic_classify",
    "pii_redact",
    "repetition_stats",
    "gopher_quality",
    "boilerplate_lines",
    "unigram_logprob",
    "ccnet_buckets",
    "tfidf_terms",
    "html_metadata",
    "doclen_quantiles",
    "doclen_zscore",
    "global_rank",
    "len_token_corr",
    "lang_regression",
    "top_word_per_lang",
    "lang_vocab_overlap",
    "top_words",
    "sentence_split",
    "prepare_text",
    "chunk_pages",
    "longest_docs",
    "image_decode",
    "video_frame_sample",
    "media_features",
    "warc_extract",
    "wet_roundtrip",
    "fuzzy_dedup",
    "dup_ngram_spans",
    "dsir_weights",
    "dsir_resample",
    "top_docs_per_lang",
    "group_sample",
    "fuzzy_url_join",
    "bloom_new_urls",
    "bigram_logprob",
    "term_postings",
    "filter_funnel",
    "domain_blocklist",
    "corpus_export",
    "semantic_dedup",
    # round-5 completion: the 12 previously-unbenched registry rows —
    # the whole 153-query registry is now benched
    "normalize_text",
    "clean_text",
    "ocr_whitelist",
    "sniff_doc_types",
    "combine_pages_ref",
    "combine_pages_lex",
    "size_class_counts",
    "image_resize",
    "blueprint_validate",
    "blueprint_generate",
    "render_pptx_styled",
    "chart_parse",
    "token_shard_export",
    # round-5 batch 2 (broadcast-regime joins + bounded-partition
    # vocab reduce — no shuffle actors, safe to run late)
    "promo_revenue",
    "disjunctive_revenue",
    "late_shipment_priority",
    "vocab_profile",
    "mode_source_per_lang",
    "orders_mom_delta",
    "bulk_suppliers",
    "session_stats",
    "daily_anomaly",
    "top_revenue_supplier",
    "grouping_sets_counts",
]
HEADLINE = "extract_e2e"


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            log_to_driver=False,
            logging_level=logging.ERROR,
        )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    # The default 50% CPU reservation for downstream operators halves
    # map-stage utilization; our pipelines are map-dominated with tiny
    # tails, so give maps the whole machine.
    ctx.op_resource_reservation_enabled = False
    # Spawn the worker pool once before timing: we benchmark steady-state
    # throughput (what a long-running cluster job sees), not Ray's
    # one-time per-session worker startup.
    ray.data.range(10_000).map_batches(lambda b: b).count()


def _consume(result) -> int:
    """Force full execution; return row count."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return len(result)
    if isinstance(result, pa.Table):
        return result.num_rows
    return result.count()  # ray.data.Dataset — executes the lazy plan


def run_default(sf_dir: str, num_cpus: int, queries: list[str]) -> dict:
    _init_ray(num_cpus)
    import ray

    from pdf_to_text_ray.pipelines.queries import QUERIES

    timings: dict[str, float] = {}
    n_docs = 0
    for name in queries:
        t0 = time.perf_counter()
        rows = _consume(QUERIES[name](sf_dir))
        timings[name] = round(time.perf_counter() - t0, 4)
        if name == HEADLINE:
            n_docs = rows
    total = round(sum(timings.values()), 4)
    out = {
        "metric": "e2e extraction + training-data ops wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "docs_per_s": round(n_docs / timings[HEADLINE], 2)
        if HEADLINE in timings and timings[HEADLINE] > 0
        else None,
    }
    ray.shutdown()
    return out


def run_headline_once(sf_dir: str, num_cpus: int, repeat: int) -> dict:
    _init_ray(num_cpus)
    import ray

    from pdf_to_text_ray.pipelines.extract import run_extraction

    t0 = time.perf_counter()
    rows = run_extraction(sf_dir, repeat=repeat).count()
    wall = time.perf_counter() - t0
    ray.shutdown()
    return {
        "rows": rows,
        "sec": round(wall, 4),
        "num_cpus": num_cpus,
        "repeat": repeat,
    }


def run_scaling(sf_dir: str, lo: int, hi: int, repeat: int) -> dict:
    """Fresh process per parallelism level (cluster-size stand-in)."""
    results = {}
    for n in (lo, hi):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(n),
            GRAFT_SF_DIR=sf_dir,
            GRAFT_BENCH_REPEAT=str(repeat),
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env,
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = proc.stdout.strip().splitlines()[-1]
        results[n] = json.loads(line)
    thr = {n: r["rows"] / r["sec"] for n, r in results.items()}
    scale = hi / lo
    eff = thr[hi] / (scale * thr[lo])
    return {
        "metric": "scaling efficiency (headline extraction, fresh sessions)",
        "value": round(eff, 4),
        "unit": "efficiency",
        "queries": {
            f"extract_e2e@{n}cpus": results[n]["sec"] for n in (lo, hi)
        },
        "docs_per_s": {str(n): round(thr[n], 2) for n in (lo, hi)},
        "sf": sf_dir,
        "num_cpus": hi,
        "scale_factor": scale,
        "repeat": repeat,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    # N=2 -> 4N=8 of the 32-core box: the levels where per-core clock /
    # memory-bandwidth throttling doesn't mask pipeline scaling. A raw
    # CPU microbenchmark (no Ray) measures this box's own 8->32-process
    # scaling ceiling at ~0.72 — see BASELINE.md; an 8->32 pipeline
    # datapoint is recorded there against that ceiling.
    ap.add_argument("--lo", type=int, default=2)
    ap.add_argument("--hi", type=int, default=8)
    ap.add_argument(
        "--repeat",
        type=int,
        default=int(os.environ.get("GRAFT_BENCH_REPEAT", "512")),
        help="deterministic corpus amplification for scaling runs",
    )
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH",
            "RESULTS_last.json",
        ),
        help="file for the FULL per-query timing map (default mode)",
    )
    args = ap.parse_args()

    if args.headline_only:
        print(json.dumps(run_headline_once(SF_DIR, NUM_CPUS, args.repeat)))
    elif args.scaling:
        print(json.dumps(run_scaling(SF_DIR, args.lo, args.hi, args.repeat)))
    else:
        out = run_default(SF_DIR, NUM_CPUS, BENCH_QUERIES)
        # The full ~110-entry per-query map overflowed the driver's
        # stdout tail capture in round 3 (BENCH_r03.json parsed:null).
        # Write the full map to --out; keep the stdout line compact:
        # summary fields + headline + the 9 slowest queries.
        try:
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out, "w") as f:
                json.dump(out, f, indent=1, sort_keys=True)
        except OSError:
            pass
        timings = out["queries"]
        slowest = dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:9]
        )
        if HEADLINE in timings:
            slowest[HEADLINE] = timings[HEADLINE]
        compact = dict(
            out,
            queries=slowest,
            n_queries=len(timings),
            queries_full_path=args.out,
        )
        print(json.dumps(compact))


if __name__ == "__main__":
    main()
