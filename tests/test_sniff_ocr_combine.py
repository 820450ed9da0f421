"""Sniffer classification, OCR stub/whitelist, combine semantics
(including the reference's lexicographic-order quirk, FIXTURES.md F4)."""

import zlib

from pdf_to_text_ray.pdfgen import OCR_MAGIC
from pdf_to_text_ray.stages.combine import (
    combine_page_headers,
    combine_reference_lex,
)
from pdf_to_text_ray.stages.ocr import StubOcr
from pdf_to_text_ray.stages.sniff import sniff_payload


def test_sniff_pdf_magic():
    assert sniff_payload(b"%PDF-1.4\nrest") == "pdf"
    assert sniff_payload(b"  \n%PDF-1.7") == "pdf"  # leading whitespace ok


def test_sniff_html_markers():
    assert sniff_payload(b"<!DOCTYPE html><html>") == "html"
    assert sniff_payload(b"<HTML><BODY>") == "html"
    assert sniff_payload(b"\n <div class=x>") == "html"


def test_sniff_unknown():
    assert sniff_payload(b"\x00\x01\x02 garbage") == "unknown"
    assert sniff_payload(b"") == "unknown"
    assert sniff_payload(None) == "unknown"


def test_ocr_stub_decodes_magic_and_flate():
    s = StubOcr()
    assert s.recognize(OCR_MAGIC + b"hello page") == "hello page"
    assert s.recognize(zlib.compress(OCR_MAGIC + b"hello page")) == "hello page"
    assert s.recognize(b"") == ""
    assert s.recognize(None) == ""
    assert s.recognize(b"random bytes") == ""


def test_combine_page_headers_reference_format():
    # core_document_generator.py:185-187
    out = combine_page_headers(["alpha", "beta"])
    assert out == "\n\n--- PAGE 1 ---\n\nalpha\n\n--- PAGE 2 ---\n\nbeta"


def test_combine_lex_order_quirk():
    # combine_texts.py:20: sorted() on names -> page_1, page_10, ..., page_2
    named = [(f"page_{i}.txt", f"t{i}") for i in range(1, 12)]
    out = combine_reference_lex(named)
    order = [
        seg.split(" ----")[0]
        for seg in out.split("---- ")[1:]
    ]
    assert order == [
        "page_1.txt", "page_10.txt", "page_11.txt", "page_2.txt",
        "page_3.txt", "page_4.txt", "page_5.txt", "page_6.txt",
        "page_7.txt", "page_8.txt", "page_9.txt",
    ]
    # separator format: ---- name ----\n\n<text>\n + '='*50 + \n
    assert "\n\n---- page_1.txt ----\n\nt1\n" + "=" * 50 + "\n" in out


def _pages_table():
    """Page rows covering every finalize branch: a url with two crawls
    (dedup keeps the latest), an 11-page doc (lex-vs-numeric order
    diverges), an OCR'd null page_text, a parse-failed doc (route
    'none'), and a mixed ok/fail doc."""
    import pyarrow as pa

    rows = []

    def page(url, ts, pno, text, route, ok, err=None):
        rows.append(
            dict(url=url, warc_ts=ts, lang="en", doc_type="pdf",
                 partition_id=hash(url) % 7, page_no=pno, page_text=text,
                 route=route, ocr_payload=None, parse_ok=ok, error=err)
        )

    for pno in range(1, 12):
        page("http://a.example/1", 100, pno, f"A{pno}", "text_layer", True)
    page("http://a.example/1", 90, 1, "stale", "text_layer", True)  # old crawl
    page("http://b.example/2", 50, 1, None, "ocr", True)
    page("http://b.example/2", 50, 2, "B2", "text_layer", True)
    page("http://c.example/3", 10, 1, "", "none", False, "boom")
    page("http://d.example/4", 20, 1, "D1", "text_layer", True)
    page("http://d.example/4", 20, 2, "", "none", False, "bad page")

    cols = {k: [r[k] for r in rows] for k in rows[0]}
    return pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
            "lang": pa.array(cols["lang"], pa.string()),
            "doc_type": pa.array(cols["doc_type"], pa.string()),
            "partition_id": pa.array(cols["partition_id"], pa.int32()),
            "page_no": pa.array(cols["page_no"], pa.int32()),
            "page_text": pa.array(cols["page_text"], pa.string()),
            "route": pa.array(cols["route"], pa.string()),
            "ocr_payload": pa.array(cols["ocr_payload"], pa.binary()),
            "parse_ok": pa.array(cols["parse_ok"], pa.bool_()),
            "error": pa.array(cols["error"], pa.string()),
        }
    )


def test_arrow_finalizer_matches_pandas():
    """The fused path's Arrow-native combine must be byte-identical to
    the pandas map_groups combine in both page orders (VERDICT r2 #8)."""
    import pyarrow as pa

    from pdf_to_text_ray.stages.combine import (
        make_finalizer,
        make_finalizer_arrow,
    )

    t = _pages_table()
    for order in ("numeric", "lex"):
        pd_out = make_finalizer("\n", order)(t.to_pandas())
        ar_out = make_finalizer_arrow("\n", order)(t)
        pd_as_arrow = pa.Table.from_pandas(pd_out, preserve_index=False)
        assert ar_out.column_names == pd_as_arrow.column_names
        for name in ar_out.column_names:
            a = ar_out[name].combine_chunks()
            b = pd_as_arrow[name].combine_chunks().cast(a.type)
            assert a.equals(b), f"column {name} differs for order={order}"
    # spot-check semantics, not just agreement
    out = {r["url"]: r for r in ar_out.to_pylist()}
    assert out["http://a.example/1"]["n_pages"] == 11
    assert "stale" not in out["http://a.example/1"]["text"]
    lex = make_finalizer_arrow("\n", "lex")(t).to_pylist()
    lex_a = next(r for r in lex if r["url"] == "http://a.example/1")
    assert lex_a["text"].split("\n")[:3] == ["A1", "A10", "A11"]
    assert out["http://b.example/2"]["text"] == "\nB2"  # null ocr page -> ""
    assert out["http://c.example/3"] == dict(
        url="http://c.example/3", text="", doc_type="pdf", lang="en",
        n_pages=0, n_chars=0, routes=[], parse_failures=1, parse_ok=False,
        partition_id=hash("http://c.example/3") % 7,
    )
    assert out["http://d.example/4"]["parse_failures"] == 1
    assert out["http://d.example/4"]["parse_ok"] is False
