"""End-to-end golden + invariance tests (SURVEY.md §5, FIXTURES.md F2).

The per-row invariant (BASELINE.json north_rule): extracted text is
byte-identical per url to the oracle. The oracle here is the corpus
construction itself — every payload class embeds documents.text so the
expected extraction is exactly that text (junk rows extract to "").

Invariance: identical results from the broadcast (map-only) and shuffle
(groupby) dedup paths, and under different block layouts — the property
the sequential reference gets for free and a parallel engine must prove.
"""

from dataclasses import replace

import pandas as pd
import pytest

from pdf_to_text_ray.config import DEFAULT_CONFIG
from pdf_to_text_ray.pipelines.extract import (
    read_documents,
    run_extraction,
    stale_droplist,
    synthesize_docs,
    synthesize_keys,
)
from pdf_to_text_ray.sources.synth import url_for

from conftest import SF_DIR


def _expected(documents_df: pd.DataFrame) -> dict[str, str]:
    out = {}
    for r in documents_df.itertuples():
        cls = r.doc_id % 10
        out[url_for(r.doc_id)] = "" if cls == 9 else r.text
    return out


def _by_url(ds) -> dict[str, dict]:
    return {r["url"]: r for r in ds.take_all()}


@pytest.fixture(scope="module")
def extracted(sf_dir):
    return _by_url(run_extraction(sf_dir))


def test_every_url_byte_identical(extracted, documents_df):
    expected = _expected(documents_df)
    assert set(extracted) == set(expected)
    mismatches = [
        u for u, want in expected.items() if extracted[u]["text"] != want
    ]
    assert mismatches == [], f"{len(mismatches)} urls differ: {mismatches[:5]}"


def test_match_rate_is_100_percent(extracted, documents_df):
    expected = _expected(documents_df)
    n_match = sum(extracted[u]["text"] == w for u, w in expected.items())
    assert n_match / len(expected) == 1.0


def test_stale_recrawls_deduped(extracted, documents_df):
    # cls==2 rows emit an extra stale crawl; exactly one row per url must
    # survive, carrying the latest crawl's content (not "stale draft of")
    dup_urls = [
        url_for(r.doc_id)
        for r in documents_df.itertuples()
        if r.doc_id % 10 == 2
    ]
    assert dup_urls
    for u in dup_urls:
        assert not extracted[u]["text"].startswith("stale draft of")


def test_junk_rows_carry_error_not_poison(extracted, documents_df):
    junk = [
        url_for(r.doc_id)
        for r in documents_df.itertuples()
        if r.doc_id % 10 == 9
    ]
    assert junk
    for u in junk:
        row = extracted[u]
        assert row["text"] == "" and not row["parse_ok"]
        assert row["doc_type"] == "unknown" and row["n_pages"] == 0


def test_broadcast_and_shuffle_paths_identical(sf_dir, extracted):
    shuffle_cfg = replace(DEFAULT_CONFIG, dedup_mode="shuffle")
    other = _by_url(run_extraction(sf_dir, shuffle_cfg))
    assert set(other) == set(extracted)
    for u, row in extracted.items():
        o = other[u]
        assert (row["text"], row["n_pages"], row["parse_ok"], row["routes"]) == (
            o["text"], o["n_pages"], o["parse_ok"], o["routes"]
        ), u


def test_block_layout_invariance(sf_dir, extracted):
    # Same corpus read as 3 blocks instead of 4xCPU blocks: byte-identical.
    from pdf_to_text_ray.pipelines.extract import (
        extract_pipeline_broadcast,
        synthesize_batch,
    )

    docs = read_documents(sf_dir, num_blocks=3).map_batches(
        synthesize_batch, batch_format="pyarrow", batch_size=None
    )
    dups = stale_droplist(synthesize_keys(sf_dir))
    other = _by_url(extract_pipeline_broadcast(docs, dups))
    assert set(other) == set(extracted)
    for u, row in extracted.items():
        assert other[u]["text"] == row["text"], u


def test_routes_cover_all_three(extracted):
    seen = {r for row in extracted.values() for r in row["routes"]}
    assert {"dom", "text_layer", "ocr"} <= seen

def test_droplist_budget_degradation(sf_dir):
    """The droplist merge must produce the SAME droplist through all
    three budget regimes: unbounded driver merge, distributed-groupby
    merge (partials bust the budget), and DroplistBudgetExceeded when
    even the re-crawled set can't broadcast."""
    import pytest

    from pdf_to_text_ray.pipelines.extract import DroplistBudgetExceeded

    keys = synthesize_keys(sf_dir)
    default = stale_droplist(keys)
    assert default  # cls==2 re-crawls exist
    # tiny budget -> distributed merge path; identical result
    small = stale_droplist(synthesize_keys(sf_dir), byte_budget=20_000)
    assert small == default
    # sub-droplist budget -> explicit refusal
    with pytest.raises(DroplistBudgetExceeded):
        stale_droplist(synthesize_keys(sf_dir), byte_budget=64)


def test_run_extraction_shuffle_fallback(sf_dir, extracted):
    """When the droplist busts the budget, run_extraction silently
    degrades to the shuffle pipeline and still produces byte-identical
    output."""
    from dataclasses import replace

    from pdf_to_text_ray.config import DEFAULT_CONFIG
    from pdf_to_text_ray.pipelines.extract import run_extraction

    cfg = replace(DEFAULT_CONFIG, droplist_budget_bytes=64)
    rows = _by_url(run_extraction(sf_dir, cfg))
    assert set(rows) == set(extracted)
    for u, row in extracted.items():
        assert rows[u]["text"] == row["text"], u


def test_cli_query_and_export_paths(tmp_path):
    """CLI smoke (subprocess — the CLI owns its own Ray session):
    --list-queries needs no session; --query writes parquet."""
    import json
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # force a private local session

    out = subprocess.run(
        [sys.executable, "-m", "pdf_to_text_ray.cli", "--list-queries"],
        capture_output=True, text=True, cwd=root, env=env,
    )
    assert out.returncode == 0
    listed = dict(l.split("\t") for l in out.stdout.strip().splitlines())
    assert listed["extract_e2e"] == "sql"
    # round 3: the byte-accounting oracle closed the last rows-only slot
    assert listed["size_class_counts"] == "sql"
    assert "rows-only" not in listed.values()

    qdir = str(tmp_path / "q")
    out = subprocess.run(
        [sys.executable, "-m", "pdf_to_text_ray.cli", "--num-cpus", "2",
         "--query", "lang_id", "--output", qdir],
        capture_output=True, text=True, cwd=root, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["rows"] == 500
    import pyarrow.parquet as pq

    assert pq.read_table(qdir).num_rows == 500


def test_csv_and_jsonl_sources_feed_the_same_ops(sf_dir, tmp_path):
    """Source-format flexibility: the engine's batch ops are
    format-agnostic — documents re-encoded as CSV and JSONL, read via
    ray.data.read_csv / read_json, produce byte-identical op output to
    the parquet-sourced run."""
    import pyarrow.parquet as pq
    import ray.data

    from pdf_to_text_ray.stages.textstats import token_stats_batch

    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    csv_dir = tmp_path / "csv"
    jsonl_dir = tmp_path / "jsonl"
    csv_dir.mkdir()
    jsonl_dir.mkdir()
    import pyarrow.csv as pacsv

    pacsv.write_csv(tbl, str(csv_dir / "docs.csv"))
    with open(jsonl_dir / "docs.jsonl", "w") as f:
        for r in tbl.to_pylist():
            import json

            f.write(json.dumps(r) + "\n")

    def run(ds):
        return sorted(
            map(
                repr,
                ds.map_batches(
                    token_stats_batch, batch_format="pyarrow"
                ).take_all(),
            )
        )

    want = run(ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"]))
    got_csv = run(ray.data.read_csv(str(csv_dir)))
    got_jsonl = run(ray.data.read_json(str(jsonl_dir)))
    assert got_csv == want
    assert got_jsonl == want


def test_cli_warc_round(tmp_path):
    """CLI container round: --to-warc exports shards, --from-warc
    extracts from them (checkpointed), and a --resume rerun skips
    every completed partition."""
    import json
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    wdir, odir = str(tmp_path / "warc"), str(tmp_path / "out")

    out = subprocess.run(
        [sys.executable, "-m", "pdf_to_text_ray.cli", "--num-cpus", "2",
         "--sf-dir", SF_DIR, "--to-warc", wdir],
        capture_output=True, text=True, cwd=root, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    s = json.loads(out.stdout.strip().splitlines()[-1])
    assert s["records"] == 550  # 500 docs + 50 stale re-crawls

    out = subprocess.run(
        [sys.executable, "-m", "pdf_to_text_ray.cli", "--num-cpus", "2",
         "--from-warc", wdir, "--output", odir],
        capture_output=True, text=True, cwd=root, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    s = json.loads(out.stdout.strip().splitlines()[-1])
    assert s["urls"] == 500 and s["computed_partitions"] == 64

    out = subprocess.run(
        [sys.executable, "-m", "pdf_to_text_ray.cli", "--num-cpus", "2",
         "--from-warc", wdir, "--output", odir, "--resume"],
        capture_output=True, text=True, cwd=root, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    s = json.loads(out.stdout.strip().splitlines()[-1])
    assert s["skipped_partitions"] == 64 and s["computed_partitions"] == 0
