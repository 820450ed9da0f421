"""Differential fuzzing of the query/oracle contract.

The driver gate and tools/check_oracle.py prove Ray/SQL agreement on
the SYNTHETIC corpus — whose texts are lowercase ASCII words with
single spaces. These tests re-run a broad slice of the text-op
query/oracle pairs on RANDOMIZED corpora the synthesizer never
produces (punctuation tokens, digits, newlines/tabs, empty and
whitespace-only docs, cross-doc boilerplate lines, exact duplicate
docs, mixed-case words) and require the same bit-level agreement.
Agreement here means the engine's tokenization/hashing/aggregation
semantics match the documented SQL contract, not just one dataset.

Whitespace caveat (documented, deliberate): fuzz whitespace is limited
to space/tab/newline — the characters where Python and DuckDB-RE2
``\\s`` agree. Python's ``str.strip``/``re \\s`` additionally treat
VT (``\\x0b``) and (strip only) ``\\x1c``-``\\x1f`` as whitespace
while RE2 does not, and the two regex engines also differ on
non-ASCII whitespace/letter classes. The engine keeps the reference's
Python semantics; the oracle contract is therefore the corpus the
north star describes — ASCII text whose whitespace is
space/tab/newline/CR (extraction normalizes upstream).
"""

import os
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)
from check_oracle import _arrow_exact_df, compare, to_pandas  # noqa: E402

from pdf_to_text_ray.pipelines.queries import ORACLE_SQL, QUERIES  # noqa: E402

_WORDS = (
    "alpha beta GAMMA delta42 epsilon zeta-xi #tag a.b.c 12345 -- "
    "the of and to in is it you that he was for on are stop"
).split()


def _random_corpus(seed: int, n_docs: int = 60) -> pa.Table:
    rng = random.Random(seed)
    texts, langs = [], []
    boiler = " ".join(rng.choices(_WORDS, k=10))
    for i in range(n_docs):
        kind = rng.random()
        if kind < 0.05:
            t = ""
        elif kind < 0.10:
            t = "   \t  "
        else:
            words = rng.choices(_WORDS, k=rng.randint(1, 120))
            t = " ".join(words)
            if rng.random() < 0.3:  # newlines + double spaces
                t = t.replace(" ", "\n", 3).replace(" ", "  ", 2)
            if rng.random() < 0.3:  # cross-doc boilerplate line
                t = boiler + " " + t
        texts.append(t)
        langs.append(rng.choice(["en", "de", "fr", "es", "zh"]))
    # exact duplicate docs
    for j in range(4):
        texts.append(texts[j])
        langs.append(langs[j])
    n = len(texts)
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            # several sources, so per-domain ops (domain_quality_gate,
            # hll_distinct, temperature_mix, ...) fuzz their actual
            # multi-group logic rather than degenerating to one group
            "source": pa.array(
                [
                    random.Random(seed * 7919 + i).choice(
                        ["fuzz-a", "fuzz-b", "fuzz-c"]
                    )
                    for i in range(n)
                ],
                pa.string(),
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


# Text-only query/oracle pairs that read nothing but documents.parquet.
DIFFERENTIAL_QUERIES = [
    "token_stats",
    "quality",
    "lang_id",
    "lang_confusion",
    "longest_doc_per_lang",
    "dedup_exact",
    "line_dedup",
    "boilerplate_lines",
    "dup_ngram_spans",
    "dsir_weights",
    "dsir_resample",
    "top_docs_per_lang",
    "group_sample",
    "fuzzy_url_join",
    "bigram_logprob",
    "unigram_logprob",
    "tfidf_terms",
    "term_postings",
    "repetition_stats",
    "gopher_quality",
    "top_words",
    "heavy_hitter_words",
    "above_avg_docs",
    "lang_quantile_cont",
    "lang_source_chi2",
    "winsorized_mean",
    "spearman_len_tokens",
    "char_budget_curation",
    "top_docs_with_ties",
    "doclen_quantiles",
    "doclen_zscore",
    "global_rank",
    "len_token_corr",
    "lang_regression",
    "top_word_per_lang",
    "lang_vocab_overlap",
    "sentence_split",
    "train_val_split",
    "stratified_sample",
    "temperature_mix",
    "pack_sequences",
    "filter_funnel",
    "corpus_export",
    "text_windows",
    "pii_redact",
    "topic_classify",
    "fingerprint",
    "hll_distinct",
    "domain_quality_gate",
    "bm25_topk",
    "minhash_near_dups",
    "simhash_near_dups",
    "dup_clusters",
    "fuzzy_dedup",
    "url_canonicalize",
    "domain_blocklist",
    "bloom_new_urls",
    "prepare_text",
    "ngram_jaccard",
    "crawl_delta",
    "decontaminate",
    "training_corpus",
    "ccnet_buckets",
    "html_metadata",
    "size_class_counts",
    "image_decode",
    "image_resize",
    "video_frame_sample",
    "media_features",
    "summarize",
    "lang_percentiles",
    "ntile_quartiles",
    "cume_dist_lengths",
    "mad_lengths",
    "bpe_token_count",
    "pmi_top_pairs",
    "weighted_sample",
    "token_shard_export",
    "vocab_profile",
    "mode_source_per_lang",
    "grouping_sets_counts",
    "lang_entropy",
]


# Extraction-contract vocabulary: single-space-joined tokens drawn
# from the OCR whitelist alphabet (A-Za-z0-9.,!?;:'"-). A short final
# PDF page legitimately routes to OCR, whose reference-faithful
# whitelist (M7) strips anything else — so '#' etc. belong only to
# the free-form corpus, where no extraction query runs.
_CONTRACT_WORDS = (
    "alpha beta GAMMA delta42 epsilon zeta-xi a.b.c 12345 -- it's "
    'he said "so" what?! end. semi; colon: the of and to in is'
).split()


def _random_singlespace_corpus(seed: int, n_docs: int = 50) -> pa.Table:
    """Random corpus honoring the synthesizer's documented text
    contract: non-empty, single-space-joined whitelist-alphabet
    tokens, no leading or trailing whitespace. The
    extraction/pagination oracles reconstruct pages under exactly this
    contract, so they are fuzzed on it (the free-form corpus above
    exercises everything else)."""
    rng = random.Random(seed)
    texts = [
        " ".join(rng.choices(_CONTRACT_WORDS, k=rng.randint(1, 200)))
        for _ in range(n_docs)
    ]
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                [rng.choice(["en", "de", "fr", "es", "zh"]) for _ in texts],
                pa.string(),
            ),
            "source": pa.array(["fuzz"] * n_docs, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


# Extraction/pagination family: oracle SQL reconstructs page layout
# under the single-space corpus contract (SURVEY §1/F1), so these fuzz
# on the contract-conforming random corpus.
EXTRACTION_QUERIES = [
    "extract_e2e",
    "warc_extract",
    "wet_roundtrip",
    "combine_pages_ref",
    "combine_pages_lex",
    "chunk_pages",
    "extraction_metrics",
    "domain_stats",
    "route_counts",
    "ocr_whitelist",
    "normalize_text",
    "clean_text",
    "sniff_doc_types",
    "markdown_report",
    "longest_docs",
]


@pytest.fixture(scope="module", params=[11, 23, 59])
def fuzz_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"fuzzcorpus{request.param}")
    pq.write_table(_random_corpus(request.param), str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module", params=[31, 47, 83])
def fuzz_dir_singlespace(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"fuzzss{request.param}")
    pq.write_table(
        _random_singlespace_corpus(request.param),
        str(d / "documents.parquet"),
    )
    return str(d)


def _check(name: str, sf_dir: str) -> None:
    got = to_pandas(QUERIES[name](sf_dir))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = _arrow_exact_df(con.sql(ORACLE_SQL[name]).arrow())
    problems = compare(name, got, exp)
    assert not problems, f"{name}: " + "; ".join(problems[:3])


@pytest.mark.parametrize("name", DIFFERENTIAL_QUERIES)
def test_query_matches_oracle_on_random_corpus(name, fuzz_dir):
    _check(name, fuzz_dir)


@pytest.mark.parametrize("name", EXTRACTION_QUERIES)
def test_extraction_matches_oracle_on_contract_corpus(
    name, fuzz_dir_singlespace
):
    _check(name, fuzz_dir_singlespace)


# ------------------------- events / embeddings table randomization

def _random_events(seed: int, n: int = 400) -> pa.Table:
    from datetime import datetime, timedelta

    rng = random.Random(seed)
    base = datetime(2026, 3, 1)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                # sub-second (microsecond) timestamps, biased so some
                # land within 1 us of an hour boundary — exercises the
                # exact-int64 // bucketing the oracles now use (a
                # double floor(epoch/3600) can flip these buckets)
                base
                + timedelta(
                    seconds=rng.randint(0, 6 * 86400),
                    microseconds=rng.choice(
                        [0, 1, 999_999, rng.randint(0, 999_999)]
                    ),
                ),
                rng.randint(1, 25),
                rng.choice(["signup", "click", "error", "view", "purchase"]),
                round(rng.uniform(0, 50), 2),
                '{"k": %d}' % rng.randint(0, 99),
            )
        )
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )


def _random_embeddings(seed: int, n: int = 150, dim: int = 64) -> pa.Table:
    rng = random.Random(seed)
    vecs = [
        [round(rng.gauss(0, 1), 4) for _ in range(dim)] for _ in range(n)
    ]
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(
                [rng.randint(0, 4) for _ in range(n)], pa.int32()
            ),
        }
    )


EVENT_QUERIES = [
    "events_hourly",
    "events_sliding",
    "events_sessionize",
    "events_range_join",
    "events_running_total",
    "events_pivot",
    "events_gap_fill",
    "events_rolling_sum",
    "events_time_delta",
    "funnel_conversion",
    "event_props",
    "markov_transitions",
    "interval_coverage",
    "running_distinct",
    "events_ewma",
    "last_event_value",
    "user_degree_hist",
    "event_paths",
    "click_except_high_value",
    "time_to_purchase",
    "all_type_users",
    "cohort_retention",
    "session_stats",
    "daily_anomaly",
]

EMBEDDING_QUERIES = [
    "embedding_near_dups",
    "embedding_near_dups_lsh",
    "semantic_dedup",
    "lsh_topk",
    "ann_cosine_topk",
    "ivf_topk",
    "kmeans_clusters",
    "embedding_gram",
    "embedding_quantize",
]


@pytest.fixture(scope="module", params=[41, 53, 89])
def fuzz_events_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"fuzzev{request.param}")
    pq.write_table(_random_events(request.param), str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module", params=[61, 67, 101])
def fuzz_embed_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"fuzzem{request.param}")
    pq.write_table(
        _random_embeddings(request.param), str(d / "embeddings.parquet")
    )
    return str(d)


def _check_table(name: str, sf_dir: str, table: str) -> None:
    got = to_pandas(QUERIES[name](sf_dir))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{sf_dir}/{table}.parquet')"
    )
    exp = _arrow_exact_df(con.sql(ORACLE_SQL[name]).arrow())
    problems = compare(name, got, exp)
    assert not problems, f"{name}: " + "; ".join(problems[:3])


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_event_query_matches_oracle_on_random_events(name, fuzz_events_dir):
    _check_table(name, fuzz_events_dir, "events")


@pytest.mark.parametrize("name", EMBEDDING_QUERIES)
def test_embedding_query_matches_oracle_on_random_vectors(
    name, fuzz_embed_dir
):
    _check_table(name, fuzz_embed_dir, "embeddings")


# --------------------------- relational (TPC-H-ish) randomization

def _random_relational(seed: int, tmpdir: str) -> None:
    """FK-consistent random warehouse with deliberate skew: one hot
    customer owns ~20% of orders, duplicate part keys in lineitem,
    some customers/segments with zero orders."""
    from datetime import datetime, timedelta

    rng = random.Random(seed)
    n_cust, n_orders, n_parts, n_supp, n_line = 40, 250, 30, 12, 500
    segs = ["BUILDING", "MACHINERY", "HOUSEHOLD", "AUTOMOBILE", "FURNITURE"]
    # TPC-H-era dates: lineitem shipdates must STRADDLE the Q1 cutoff
    # (1998-09-02) so the pricing filter keeps some rows and drops some
    base = datetime(1997, 1, 1)
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(range(3), pa.int32()),
                "r_name": pa.array(["AMERICA", "ASIA", "EUROPE"], pa.string()),
            }
        ),
        f"{tmpdir}/region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(8), pa.int32()),
                "n_name": pa.array([f"NATION{i}" for i in range(8)], pa.string()),
                "n_regionkey": pa.array(
                    [rng.randrange(3) for _ in range(8)], pa.int32()
                ),
            }
        ),
        f"{tmpdir}/nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": pa.array(
                    [f"Customer{i}" for i in range(n_cust)], pa.string()
                ),
                "c_nationkey": pa.array(
                    [rng.randrange(8) for _ in range(n_cust)], pa.int32()
                ),
                "c_acctbal": pa.array(
                    [round(rng.uniform(-999, 9999), 2) for _ in range(n_cust)],
                    pa.float64(),
                ),
                "c_mktsegment": pa.array(
                    [rng.choice(segs) for _ in range(n_cust)], pa.string()
                ),
            }
        ),
        f"{tmpdir}/customer.parquet",
    )
    hot = rng.randrange(n_cust)  # skewed key
    custkeys = [
        hot if rng.random() < 0.2 else rng.randrange(n_cust)
        for _ in range(n_orders)
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_orders), pa.int64()),
                "o_custkey": pa.array(custkeys, pa.int64()),
                "o_orderstatus": pa.array(
                    [rng.choice("OFP") for _ in range(n_orders)], pa.string()
                ),
                "o_totalprice": pa.array(
                    [round(rng.uniform(1, 99999), 2) for _ in range(n_orders)],
                    pa.float64(),
                ),
                "o_orderdate": pa.array(
                    [
                        base + timedelta(hours=rng.randint(0, 24 * 180))
                        for _ in range(n_orders)
                    ],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(
                    [rng.choice(["1-URGENT", "2-HIGH", "3-LOW"]) for _ in range(n_orders)],
                    pa.string(),
                ),
            }
        ),
        f"{tmpdir}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(n_parts), pa.int64()),
                "p_name": pa.array(
                    [f"part {i} widget" for i in range(n_parts)], pa.string()
                ),
                "p_brand": pa.array(
                    [f"Brand#{i % 5}" for i in range(n_parts)], pa.string()
                ),
                "p_type": pa.array(["STANDARD"] * n_parts, pa.string()),
                "p_size": pa.array(
                    [rng.randint(1, 50) for _ in range(n_parts)], pa.int32()
                ),
                "p_retailprice": pa.array(
                    [round(rng.uniform(100, 2000), 2) for _ in range(n_parts)],
                    pa.float64(),
                ),
            }
        ),
        f"{tmpdir}/part.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": pa.array(
                    [f"Supplier{i}" for i in range(n_supp)], pa.string()
                ),
                "s_nationkey": pa.array(
                    [rng.randrange(8) for _ in range(n_supp)], pa.int32()
                ),
                "s_acctbal": pa.array(
                    [round(rng.uniform(0, 9999), 2) for _ in range(n_supp)],
                    pa.float64(),
                ),
            }
        ),
        f"{tmpdir}/supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(
                    [rng.randrange(n_orders) for _ in range(n_line)], pa.int64()
                ),
                "l_partkey": pa.array(
                    [rng.randrange(n_parts) for _ in range(n_line)], pa.int64()
                ),
                "l_suppkey": pa.array(
                    [rng.randrange(n_supp) for _ in range(n_line)], pa.int64()
                ),
                "l_linenumber": pa.array(
                    [rng.randint(1, 7) for _ in range(n_line)], pa.int32()
                ),
                "l_quantity": pa.array(
                    [float(rng.randint(1, 50)) for _ in range(n_line)],
                    pa.float64(),
                ),
                "l_extendedprice": pa.array(
                    [round(rng.uniform(10, 9999), 2) for _ in range(n_line)],
                    pa.float64(),
                ),
                "l_discount": pa.array(
                    [round(rng.uniform(0, 0.1), 2) for _ in range(n_line)],
                    pa.float64(),
                ),
                "l_tax": pa.array(
                    [round(rng.uniform(0, 0.08), 2) for _ in range(n_line)],
                    pa.float64(),
                ),
                "l_returnflag": pa.array(
                    [rng.choice("RAN") for _ in range(n_line)], pa.string()
                ),
                "l_linestatus": pa.array(
                    [rng.choice("OF") for _ in range(n_line)], pa.string()
                ),
                "l_shipdate": pa.array(
                    [
                        base + timedelta(hours=rng.randint(0, 24 * 900))
                        for _ in range(n_line)
                    ],
                    pa.timestamp("us"),
                ),
            }
        ),
        f"{tmpdir}/lineitem.parquet",
    )


RELATIONAL_QUERIES = [
    "join_orders_segment",
    "join_orders_segment_bcast",
    "revenue_by_region",
    "pricing_summary",
    "parts_no_early_shipment",
    "supplier_revenue",
    "weighted_avg_discount",
    "pagerank",
    "rollup_revenue",
    "cube_revenue",
    "order_priority_semi",
    "large_orders",
    "idle_customers",
    "supplier_wait_blame",
    "nation_pair_volume",
    "region_price_quantiles",
    "activity_union",
    "cheapest_supplier_per_part",
    "lineitem_profile",
    "nation_revenue_share",
    "gini_by_priority",
    "promo_revenue",
    "disjunctive_revenue",
    "late_shipment_priority",
    "orders_mom_delta",
    "bulk_suppliers",
    "top_revenue_supplier",
    "market_share",
    "nation_profit",
    "returned_revenue",
    "cust_order_dist",
    "small_qty_revenue",
    "supplier_part_counts",
]


@pytest.fixture(scope="module", params=[71, 79, 103])
def fuzz_rel_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"fuzzrel{request.param}")
    _random_relational(request.param, str(d))
    # events_asof_orders pairs events with orders
    pq.write_table(_random_events(request.param), str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name", RELATIONAL_QUERIES + ["events_asof_orders"])
def test_relational_query_matches_oracle_on_random_warehouse(
    name, fuzz_rel_dir
):
    got = to_pandas(QUERIES[name](fuzz_rel_dir))
    con = duckdb.connect()
    for tbl in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{fuzz_rel_dir}/{tbl}.parquet')"
        )
    exp = _arrow_exact_df(con.sql(ORACLE_SQL[name]).arrow())
    problems = compare(name, got, exp)
    assert not problems, f"{name}: " + "; ".join(problems[:3])


# ------------------------------- markdown / render / blueprint family

# These oracles RECONSTRUCT the markdown generator's layout (SURVEY
# M16/O3), so their contract additionally requires content tokens that
# cannot be mistaken for markdown markers: no leading -/*/#/[ (bullet,
# heading, image-tag syntax) and no double quotes (blueprint JSON
# strings). The synthesizer's [a-z]+ vocabulary guarantees this; the
# fuzz vocabulary here stretches it to mixed case, digits and inner
# punctuation while honoring the marker rule.
_MD_SAFE_WORDS = (
    "alpha beta GAMMA delta42 epsilon zeta.xi a'b end. what?! semi; "
    "colon: the of and to in is it you that he was for on are stop"
).split()

MARKDOWN_QUERIES = [
    "markdown_structure",
    "blueprint_validate",
    "blueprint_generate",
    "render_outputs",
    "render_pptx_styled",
    "slide_windows",
    "chart_parse",
    "markdown_report",
    "summarize",
]


@pytest.fixture(scope="module", params=[83, 97, 107])
def fuzz_md_dir(request, tmp_path_factory):
    rng = random.Random(request.param)
    n_docs = 40
    texts = [
        " ".join(rng.choices(_MD_SAFE_WORDS, k=rng.randint(1, 150)))
        for _ in range(n_docs)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                [rng.choice(["en", "de", "fr"]) for _ in texts], pa.string()
            ),
            "source": pa.array(["fuzz"] * n_docs, pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp(f"fuzzmd{request.param}")
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", MARKDOWN_QUERIES)
def test_markdown_family_matches_oracle_on_safe_corpus(name, fuzz_md_dir):
    _check(name, fuzz_md_dir)


def test_within_edit1_matches_duckdb_levenshtein():
    """The engine's blocking-verify predicate == DuckDB levenshtein<=1
    on randomized short strings over a small alphabet (dense in the
    0/1/2-distance space, incl. empty strings)."""
    rng = random.Random(5)
    from pdf_to_text_ray.pipelines.queries import _within_edit1

    con = duckdb.connect()
    for _ in range(2000):
        a = "".join(rng.choices("abcx", k=rng.randint(0, 6)))
        b = "".join(rng.choices("abcx", k=rng.randint(0, 6)))
        sql = con.execute(
            "SELECT levenshtein(?, ?) <= 1", [a, b]
        ).fetchone()[0]
        assert _within_edit1(a, b) == sql, (a, b)


def test_deletion_hashes_match_direct_horner():
    """The O(1)-per-key deletion hashes (prefix-hash composition) ==
    direct Horner hashing of each deletion string."""
    import numpy as np

    from pdf_to_text_ray.functions.hashing import (
        _B64,
        _fmix64,
        deletion_hashes64,
    )

    def direct(s: str):
        h = np.uint64(0)
        for ch in s:
            h = h * np.uint64(_B64) + np.uint64(ord(ch))
        return _fmix64(np.array([h], np.uint64))[0]

    rng = random.Random(3)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # scalar wrap
        for _ in range(100):
            s = "".join(rng.choices("abz0-./:x", k=rng.randint(0, 12)))
            got = deletion_hashes64(s)
            assert got[0] == direct(s)
            for i in range(len(s)):
                assert got[i + 1] == direct(s[:i] + s[i + 1 :])


def _random_lineitem(seed: int, n: int = 600) -> pa.Table:
    """Randomized lineitem: fractional quantities (the synthesizer
    emits whole numbers), discount/tax grids with exact-half-cent
    boundary values, shipdates straddling the Q1 cutoff, skewed
    flag/status mixes — fuzzes the cents-quantization and dominance
    logic of pricing_summary / weighted_avg_discount / skyline."""
    from datetime import datetime, timedelta

    rng = random.Random(seed)
    base = datetime(1995, 1, 1)
    rows = []
    for i in range(n):
        qty = rng.choice(
            [rng.randint(1, 50), round(rng.uniform(0.5, 50.0), 2), 0.125]
        )
        rows.append(
            (
                i // 4 + 1,
                rng.randint(1, 200),
                rng.randint(1, 50),
                i % 4 + 1,
                float(qty),
                round(rng.uniform(900.0, 95000.0), 2),
                # TPC-H integer-percent grid: pricing_summary's exact
                # integer units are DOCUMENTED as disc = cents×(100−d%)
                # — the d%/t% domain is whole percents (as in TPC-H);
                # fractional-percent discounts are outside the contract
                rng.randint(0, 10) / 100,
                rng.randint(0, 8) / 100,
                rng.choice(["A", "N", "R"]),
                rng.choice(["O", "F"]),
                base + timedelta(days=rng.randint(0, 1800)),
            )
        )
    cols = list(zip(*rows))
    names_types = [
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us")),
    ]
    return pa.table(
        {nm: pa.array(c, t) for (nm, t), c in zip(names_types, cols)}
    )


LINEITEM_QUERIES = ["skyline", "pricing_summary", "weighted_avg_discount"]


@pytest.fixture(scope="module", params=[13, 29, 71])
def fuzz_lineitem_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"fuzzli{request.param}")
    pq.write_table(
        _random_lineitem(request.param), str(d / "lineitem.parquet")
    )
    return str(d)


@pytest.mark.parametrize("name", LINEITEM_QUERIES)
def test_lineitem_query_matches_oracle_on_random_rows(
    name, fuzz_lineitem_dir
):
    _check_table(name, fuzz_lineitem_dir, "lineitem")


def test_ntile_small_groups_match_duckdb(tmp_path):
    """NTILE(4) boundary arithmetic on group sizes 1..9 (first n%4
    buckets take ceil(n/4) rows) — constructed corpus, exact compare."""
    import itertools

    texts, langs = [], []
    for lang, n in zip("abcdefghi", range(1, 10)):
        for i in range(n):
            texts.append("x " * (i % 3 + 1))
            langs.append(f"l{lang}")
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    _check("ntile_quartiles", str(tmp_path))
    _check("lang_percentiles", str(tmp_path))
    _check("weighted_sample", str(tmp_path))


# ---------------- degenerate / tie-heavy corpora (round-5 hardening)
#
# The r4 analytic ops (Gini, cohort retention, Spearman, heavy
# hitters, winsorized mean, quantile family) fuzz above on broad
# random corpora; these fixtures pin their TIE semantics explicitly:
# all-equal values, a single group, groups with zero facts, and (for
# rollup/cube) a fully empty fact table.

def _degenerate_documents(kind: str) -> pa.Table:
    if kind == "allequal":
        # every doc identical, ONE lang: maximal ties + single group
        texts = ["the same words repeated here again now"] * 40
        langs = ["en"] * 40
    elif kind == "single":
        texts = ["lone document. one sentence only!"]
        langs = ["en"]
    else:  # twogroups-skew: one giant tied group + one singleton group
        texts = ["tied tied tied"] * 39 + ["unique longer text here ok"]
        langs = ["en"] * 39 + ["zz"]
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


DEGENERATE_DOC_QUERIES = [
    "spearman_len_tokens",
    "heavy_hitter_words",
    "winsorized_mean",
    "mad_lengths",
    "lang_quantile_cont",
    "lang_percentiles",
    "ntile_quartiles",
    "cume_dist_lengths",
    "above_avg_docs",
    "top_docs_with_ties",
]


@pytest.fixture(
    scope="module", params=["allequal", "single", "twogroups-skew"]
)
def degenerate_doc_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"degen{request.param.replace('-', '')}")
    pq.write_table(
        _degenerate_documents(request.param), str(d / "documents.parquet")
    )
    return str(d)


@pytest.mark.parametrize("name", DEGENERATE_DOC_QUERIES)
def test_analytic_ops_on_degenerate_docs(name, degenerate_doc_dir):
    _check(name, degenerate_doc_dir)


def _degenerate_warehouse(tmpdir: str, empty_orders: bool) -> None:
    """Dims always present; orders either EMPTY or all-equal
    totalprice in a single priority with one customer (so whole
    regions have zero facts)."""
    _random_relational(71, tmpdir)
    if empty_orders:
        n = 0
    else:
        n = 50
    from datetime import datetime

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n), pa.int64()),
                "o_custkey": pa.array([0] * n, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n, pa.string()),
                "o_totalprice": pa.array([1234.56] * n, pa.float64()),
                "o_orderdate": pa.array(
                    [datetime(1997, 3, 1)] * n, pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
            }
        ),
        f"{tmpdir}/orders.parquet",
    )


DEGENERATE_ORDER_QUERIES = [
    "gini_by_priority",
    "region_price_quantiles",
    "rollup_revenue",
    "cube_revenue",
]


@pytest.fixture(scope="module", params=[False, True])
def degenerate_rel_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"degenrel{int(request.param)}")
    _degenerate_warehouse(str(d), empty_orders=request.param)
    return str(d)


@pytest.mark.parametrize("name", DEGENERATE_ORDER_QUERIES)
def test_analytic_ops_on_degenerate_warehouse(name, degenerate_rel_dir):
    got = to_pandas(QUERIES[name](degenerate_rel_dir))
    con = duckdb.connect()
    for tbl in "region nation customer orders".split():
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{degenerate_rel_dir}/{tbl}.parquet')"
        )
    exp = _arrow_exact_df(con.sql(ORACLE_SQL[name]).arrow())
    problems = compare(name, got, exp)
    assert not problems, f"{name}: " + "; ".join(problems[:3])


def _degenerate_events() -> pa.Table:
    """One user, every event at the SAME microsecond (total tie), plus
    one other user with events exactly on week/day boundaries."""
    from datetime import datetime

    base = datetime(2026, 3, 5)
    boundary = datetime(1970, 1, 8)  # exact epoch-week boundary
    rows = [(i, base, 1, "click", 1.5, "{}") for i in range(30)]
    rows += [
        (30 + j, boundary, 2, "purchase", 2.5, "{}") for j in range(3)
    ]
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )


DEGENERATE_EVENT_QUERIES = [
    "cohort_retention",
    "user_degree_hist",
    "events_ewma",
]


@pytest.fixture(scope="module")
def degenerate_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("degenev")
    pq.write_table(_degenerate_events(), str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name", DEGENERATE_EVENT_QUERIES)
def test_analytic_ops_on_degenerate_events(name, degenerate_events_dir):
    _check_table(name, degenerate_events_dir, "events")


def test_round6_matches_duckdb_round_on_ties():
    """The engine's shared 6-dp rounding (functions/rounding.py) must
    equal DuckDB round(x, 6) EXACTLY — including on the 1e-6 half grid
    where Python's banker's round diverges (advisor finding)."""
    import numpy as np

    from pdf_to_text_ray.functions.rounding import round6, round6_np

    rng = random.Random(11)
    vals = [rng.uniform(-100, 100) for _ in range(3000)]
    vals += [i / 2e6 for i in range(-60, 60)]
    vals += [1.0000005, 2.0000015, -1.0000005, 4.9999995, -4.9999995]
    con = duckdb.connect()
    exp = [
        con.execute("SELECT round(?::DOUBLE, 6)", [v]).fetchone()[0]
        for v in vals
    ]
    got_np = round6_np(np.asarray(vals))
    n_py_diff = 0
    for v, e, gn in zip(vals, exp, got_np):
        g = round6(v)
        assert g == e or (g == 0 == e), (v, g, e)
        assert gn == e or (gn == 0 == e), (v, gn, e)
        if round(v, 6) != e:
            n_py_diff += 1
    assert n_py_diff > 0  # the battery genuinely exercises the ties
