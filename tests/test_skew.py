"""Skew handling: a multi-hundred-page PDF (FIXTURES.md F1
pdf_multipage_xl) flows through the same pipeline as tweets without
poisoning batches, and the sniffer's size_class bucketing is correct."""

import pyarrow as pa
import pytest

import ray.data

from pdf_to_text_ray.config import DEFAULT_CONFIG
from pdf_to_text_ray.pdfgen import build_pdf
from pdf_to_text_ray.pipelines.extract import extract_pipeline_broadcast
from pdf_to_text_ray.sources.synth import EPOCH
from pdf_to_text_ray.stages.sniff import make_sniffer


@pytest.fixture(scope="module")
def xl_corpus():
    """1 XL PDF (300 pages) among 50 tiny HTML docs."""
    words = " ".join(f"word{i} token{i} item{i}" for i in range(20))
    pages = [f"page {p} of the xl document " + words for p in range(300)]
    xl_pdf = build_pdf(pages, text_layer=True, image_layer=True, flate=True)
    rows = [
        {
            "url": "https://xl.example/giant",
            "warc_ts": EPOCH,
            "html": xl_pdf,
            "text": "",
            "lang": "en",
        }
    ]
    for i in range(50):
        rows.append(
            {
                "url": f"https://small.example/{i}",
                "warc_ts": EPOCH,
                "html": f"<html><body><p>tiny document {i} body text</p></body></html>".encode(),
                "text": "",
                "lang": "en",
            }
        )
    return rows, " ".join(p.strip() for p in pages)


def test_xl_pdf_exploded_and_reassembled(xl_corpus):
    rows, expected_text = xl_corpus
    docs = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = {
        r["url"]: r
        for r in extract_pipeline_broadcast(docs, {}, DEFAULT_CONFIG).take_all()
    }
    giant = out["https://xl.example/giant"]
    assert giant["n_pages"] == 300 and giant["parse_ok"]
    assert giant["text"] == expected_text
    # neighbours in the same batch are unaffected
    assert out["https://small.example/0"]["text"] == "tiny document 0 body text"
    assert len(out) == 51


def test_size_class_bucketing(xl_corpus):
    rows, _ = xl_corpus
    t = pa.Table.from_pylist(rows)
    sniffed = make_sniffer(DEFAULT_CONFIG)(t)
    by_url = dict(zip(sniffed["url"].to_pylist(), sniffed["size_class"].to_pylist()))
    assert by_url["https://xl.example/giant"] in ("l", "xl")
    assert by_url["https://small.example/0"] == "s"
    n_bytes = dict(zip(sniffed["url"].to_pylist(), sniffed["n_bytes"].to_pylist()))
    assert n_bytes["https://xl.example/giant"] == len(rows[0]["html"])


def test_xl_pdf_survives_warc_container_round(xl_corpus, tmp_path):
    """The 300-page PDF round-trips through gzip WARC shards and
    extracts byte-identically to the direct path — container framing
    must be payload-size-agnostic."""
    from pdf_to_text_ray.pipelines.extract import extract_pipeline
    from pdf_to_text_ray.sources.warc import read_warc, write_warc_shards

    rows, expected_text = xl_corpus
    docs = ray.data.from_arrow(pa.Table.from_pylist(rows))
    write_warc_shards(docs, str(tmp_path))
    out = {
        r["url"]: r
        for r in extract_pipeline(
            read_warc(str(tmp_path)), DEFAULT_CONFIG
        ).take_all()
    }
    giant = out["https://xl.example/giant"]
    assert giant["n_pages"] == 300 and giant["parse_ok"]
    assert giant["text"] == expected_text
    assert len(out) == 51
