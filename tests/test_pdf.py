"""PDF generator ↔ parser round trip, router threshold boundary
(FIXTURES.md F5), reading-order sort, failure paths."""

import pytest

from pdf_to_text_ray.pdfgen import OCR_MAGIC, build_pdf, paginate
from pdf_to_text_ray.stages.pdf_extract import (
    PdfParseError,
    parse_pdf,
)


def _join_pages(recs):
    out = []
    for r in recs:
        if r["page_text"] is not None:
            out.append(r["page_text"])
        else:
            payload = r["ocr_payload"]
            assert payload.startswith(OCR_MAGIC)
            out.append(payload[len(OCR_MAGIC):].decode())
    return out


@pytest.mark.parametrize("flate", [False, True])
def test_round_trip_dual_layer(flate):
    text = " ".join(f"tok{i}" for i in range(150))
    pages = paginate(text, 60)
    recs = parse_pdf(build_pdf(pages, flate=flate))
    got = _join_pages(recs)
    assert [g.replace("\n", " ") for g in got] == pages
    # line breaks replace single spaces 1:1 — byte length preserved
    assert all(len(g) == len(p) for g, p in zip(got, pages))


def test_round_trip_real_deflate_level6():
    """The synth corpus uses stored-block zlib (level 0, pdfgen
    ZLIB_LEVEL) for byte-accounting oracles; the parser must still
    inflate genuinely COMPRESSED FlateDecode streams — real-world PDFs
    aren't stored-block."""
    text = " ".join(f"tok{i}" for i in range(150))
    pages = paginate(text, 60)
    data = build_pdf(pages, flate=True, zlevel=6)
    assert len(data) < len(build_pdf(pages, flate=True, zlevel=0))
    recs = parse_pdf(data)
    assert [g.replace("\n", " ") for g in _join_pages(recs)] == pages


def test_page_order_and_numbers():
    pages = [" ".join(f"p{k}w{i}" for i in range(70)) for k in range(5)]
    recs = parse_pdf(build_pdf(pages))
    assert [r["page_no"] for r in recs] == [1, 2, 3, 4, 5]
    assert [g.replace("\n", " ") for g in _join_pages(recs)] == pages


def test_reading_order_sort():
    # generator emits lines bottom-up and splits even lines into
    # x-offset segments emitted right-first — parser must restore order
    text = " ".join(f"w{i:03d}" for i in range(64))
    recs = parse_pdf(build_pdf([text]))
    got = recs[0]["page_text"] or ""
    assert got.replace("\n", " ") == text


@pytest.mark.parametrize(
    "n_chars,expect_route",
    [(249, "ocr"), (250, "ocr"), (251, "text_layer")],
)
def test_router_threshold_boundary(n_chars, expect_route):
    # strict > 250 on whitespace-stripped length
    # (core_document_processing.py:76)
    word = "abcde"  # 5 meaningful chars per word
    n_words = n_chars // 5
    rem = n_chars % 5
    words = [word] * n_words + ([word[:rem]] if rem else [])
    text = " ".join(words)
    from pdf_to_text_ray.functions.scalar import meaningful_length

    assert meaningful_length(text) == n_chars
    recs = parse_pdf(build_pdf([text]))
    assert recs[0]["route"] == expect_route


def test_image_only_forces_ocr():
    pages = paginate(" ".join(f"x{i}" for i in range(200)), 60)
    recs = parse_pdf(build_pdf(pages, text_layer=False))
    assert all(r["route"] == "ocr" for r in recs)
    assert all(r["ocr_payload"] is not None for r in recs)


def test_junk_raises():
    with pytest.raises(PdfParseError):
        parse_pdf(b"junk bytes that are not a pdf")


def test_truncated_pdf_partial_or_error():
    text = " ".join(f"tok{i}" for i in range(100))
    data = build_pdf(paginate(text, 60))
    # cutting the tail (xref area) must not break the object scan
    recs = parse_pdf(data[: int(len(data) * 0.98)])
    assert len(recs) >= 1


def test_escaped_strings():
    text = "parens (here) and \\ backslash " + " ".join(
        f"f{i}" for i in range(80)
    )
    recs = parse_pdf(build_pdf([text]))
    joined = " ".join(
        (r["page_text"] or "").replace("\n", " ") for r in recs
    )
    assert joined == text
