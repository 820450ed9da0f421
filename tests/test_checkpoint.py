"""Checkpoint / lineage / resume (SURVEY.md §5 "resume test",
FIXTURES.md F6): a failed run resumes without recomputing completed
partitions, and the resumed output is byte-stable.
"""

import json
import os
import shutil

import pytest

from pdf_to_text_ray.config import PipelineConfig
from pdf_to_text_ray.pipelines.extract import (
    stale_droplist,
    synthesize_docs,
    synthesize_keys,
)
from pdf_to_text_ray.state.checkpoint import (
    completed_partitions,
    data_path,
    lineage_path,
    read_extracted,
    run_checkpointed,
)


@pytest.fixture()
def ckpt_dir(tmp_path):
    return str(tmp_path / "ckpt")


def _cfg(out: str) -> PipelineConfig:
    return PipelineConfig(output_dir=out, num_partitions=16)


def _run(sf_dir, cfg):
    dups = stale_droplist(synthesize_keys(sf_dir))
    return run_checkpointed(synthesize_docs(sf_dir), cfg, dups)


def test_full_run_writes_all_partitions_and_lineage(sf_dir, ckpt_dir):
    cfg = _cfg(ckpt_dir)
    res = _run(sf_dir, cfg)
    assert res["computed"] == 16 and res["skipped"] == 0
    assert completed_partitions(ckpt_dir) == set(range(16))
    lin = json.load(open(lineage_path(ckpt_dir, 0)))
    assert {"partition_id", "urls", "docs_ok", "docs_failed", "chars_out",
            "route_dom", "route_text_layer", "route_ocr", "wall_s"} <= set(lin)
    total_urls = sum(
        json.load(open(lineage_path(ckpt_dir, p)))["urls"] for p in range(16)
    )
    assert total_urls == read_extracted(ckpt_dir).count() == 500


def test_resume_skips_completed_and_recomputes_failed(sf_dir, ckpt_dir):
    cfg = _cfg(ckpt_dir)
    _run(sf_dir, cfg)
    before = {
        p: open(data_path(ckpt_dir, p), "rb").read() for p in range(16)
    }

    # simulate a mid-run crash: partitions 3 and 7 lost their lineage
    # (the atomic-write contract: no lineage => recompute), 7 also lost
    # its data file entirely.
    os.remove(lineage_path(ckpt_dir, 3))
    os.remove(lineage_path(ckpt_dir, 7))
    os.remove(data_path(ckpt_dir, 7))
    assert completed_partitions(ckpt_dir) == set(range(16)) - {3, 7}

    res = _run(sf_dir, cfg)
    assert res["skipped"] == 14
    assert res["computed"] == 2
    assert sorted(res["lineage"]["partition_id"]) == [3, 7]

    # byte-stable: recomputed partitions identical to the first run,
    # untouched partitions untouched
    after = {p: open(data_path(ckpt_dir, p), "rb").read() for p in range(16)}
    for p in range(16):
        assert after[p] == before[p], f"partition {p} not byte-stable"
    assert read_extracted(ckpt_dir).count() == 500


def test_resume_noop_when_complete(sf_dir, ckpt_dir):
    cfg = _cfg(ckpt_dir)
    _run(sf_dir, cfg)
    res = _run(sf_dir, cfg)
    assert res["computed"] == 0 and res["skipped"] == 16


def test_data_without_lineage_is_recomputed(sf_dir, ckpt_dir):
    cfg = _cfg(ckpt_dir)
    _run(sf_dir, cfg)
    os.remove(lineage_path(ckpt_dir, 5))  # data file still present
    assert 5 not in completed_partitions(ckpt_dir)
    res = _run(sf_dir, cfg)
    assert res["computed"] == 1 and res["skipped"] == 15

def test_meta_pins_partition_layout(sf_dir, ckpt_dir):
    """Resuming with a different num_partitions (or combine settings)
    must fail fast instead of silently mixing partition layouts."""
    _run(sf_dir, _cfg(ckpt_dir))
    assert os.path.exists(os.path.join(ckpt_dir, "meta.json"))
    # identical config resumes fine
    res = _run(sf_dir, _cfg(ckpt_dir))
    assert res["skipped"] == 16
    # different partition count: refused
    with pytest.raises(ValueError, match="resume config mismatch"):
        _run(sf_dir, PipelineConfig(output_dir=ckpt_dir, num_partitions=8))
    # different combine semantics: refused
    with pytest.raises(ValueError, match="resume config mismatch"):
        _run(
            sf_dir,
            PipelineConfig(
                output_dir=ckpt_dir, num_partitions=16, combine_order="lex"
            ),
        )


def test_compact_parquet_roundtrip(sf_dir, tmp_path):
    """Fragmented parquet dir -> few right-sized files, identical row
    multiset, and a refusal on a dirty output dir."""
    import pyarrow.parquet as pq
    import pytest
    import ray.data

    from pdf_to_text_ray.sources.compact import compact_parquet

    frag = str(tmp_path / "frag")
    # 32 tiny files
    ray.data.read_parquet(f"{sf_dir}/documents.parquet").repartition(
        32
    ).write_parquet(frag)
    import os

    assert len(os.listdir(frag)) >= 32
    # checkpoint dirs hold json sidecars — they must not reach the
    # parquet reader (regression: read_parquet(dir) parsed them)
    with open(os.path.join(frag, "meta.json"), "w") as f:
        f.write("{}")

    out = str(tmp_path / "compact")
    stats = compact_parquet(frag, out, target_bytes=1 << 30)
    assert stats["output_files"] < stats["input_files"]
    assert stats["rows"] == 500

    import glob

    import pyarrow as pa

    a = pa.concat_tables(
        pq.read_table(f) for f in sorted(glob.glob(f"{frag}/*.parquet"))
    ).sort_by("doc_id")
    b = pq.read_table(out).sort_by("doc_id")
    assert a.select(sorted(a.column_names)).equals(
        b.select(sorted(b.column_names))
    )
    with pytest.raises(ValueError):
        compact_parquet(frag, out)
