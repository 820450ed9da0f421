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
