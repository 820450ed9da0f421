"""Deterministic minimal PDF writer.

Generates the PDF payload classes of the synthetic Common-Crawl-style
corpus (FIXTURES.md F1): real PDF 1.4 files with xref table, trailer,
page tree, Helvetica text layers (``BT/ET``, ``Tm``, ``Tj``/``TJ``,
raw or FlateDecode content streams) and image XObjects.

Dual-layer pages carry BOTH a text layer and an image XObject whose
(Flate-compressed) pixel stream embeds the page text behind a magic
marker — the deterministic stand-in for "rasterized page a real OCR
engine would read" (the reference itself stubs an unavailable OCR
engine to a deterministic result, core_document_processing.py:136-143).
Image-only pages (no text operators) force the OCR route, matching the
reference's sparse-text fallback (core_document_processing.py:76-83).

Layout quirks are intentional so the parser's reading-order sort is
actually exercised: lines are EMITTED in reverse order with absolute
``Tm`` positions, and even lines are split into two x-offset segments
emitted right-segment-first.
"""

from __future__ import annotations

import zlib

OCR_MAGIC = b"OCRSTUB1"  # prefix of the embedded "raster" payload

# zlib level for generated streams: 0 (stored blocks) keeps the
# FlateDecode framing REAL — the parser inflates them like any deflate
# stream — while making every stream length a closed form of its
# content: len + 11 + 5*(len // 65535). That closed form lets the
# byte-accounting oracle (SQL_SIZE_CLASS_COUNTS) reconstruct exact
# payload sizes in pure SQL. Parser compatibility with genuinely
# compressed streams stays pinned by tests that build at level 6.
ZLIB_LEVEL = 0
WORDS_PER_LINE = 8
PAGE_W, PAGE_H = 612, 792
TOP_Y, LEADING, LEFT_X, MID_X = 760, 14, 72, 300


def escape_pdf_string(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def paginate(text: str, words_per_page: int = 60) -> list[str]:
    """Split a single-space-joined text into page chunks at word
    boundaries such that ``" ".join(pages) == text``."""
    words = text.split(" ")
    return [
        " ".join(words[i : i + words_per_page])
        for i in range(0, len(words), words_per_page)
    ] or [""]


def _text_layer_ops(page_text: str) -> bytes:
    """Content-stream text operators for one page.

    Lines of ≤WORDS_PER_LINE words; emitted bottom-up (reversed) with
    absolute Tm positions; even lines split into two segments with the
    right segment emitted first; odd lines use TJ arrays with kerning
    numbers. A correct parser must sort runs by (-y, x) and concatenate
    TJ strings to recover the text.
    """
    words = page_text.split(" ") if page_text else []
    lines = [
        " ".join(words[i : i + WORDS_PER_LINE])
        for i in range(0, len(words), WORDS_PER_LINE)
    ]
    ops: list[bytes] = [b"BT", b"/F1 12 Tf"]
    emitted: list[bytes] = []
    for i, line in enumerate(lines):
        y = TOP_Y - LEADING * i
        lw = line.split(" ")
        if i % 2 == 0 and len(lw) >= 4:
            # two segments; seg_a keeps the joining space; emit right first
            cut = len(lw) // 2
            seg_a = " ".join(lw[:cut]) + " "
            seg_b = " ".join(lw[cut:])
            emitted.append(
                f"1 0 0 1 {MID_X} {y} Tm ({escape_pdf_string(seg_b)}) Tj".encode()
            )
            emitted.append(
                f"1 0 0 1 {LEFT_X} {y} Tm ({escape_pdf_string(seg_a)}) Tj".encode()
            )
        elif i % 2 == 1 and len(lw) >= 2:
            # TJ array with kerning numbers the extractor must skip
            cut = len(lw) // 2
            seg_a = escape_pdf_string(" ".join(lw[:cut]) + " ")
            seg_b = escape_pdf_string(" ".join(lw[cut:]))
            emitted.append(
                f"1 0 0 1 {LEFT_X} {y} Tm [({seg_a}) -28 ({seg_b})] TJ".encode()
            )
        else:
            emitted.append(
                f"1 0 0 1 {LEFT_X} {y} Tm ({escape_pdf_string(line)}) Tj".encode()
            )
    ops.extend(reversed(emitted))  # reverse emission order on purpose
    ops.append(b"ET")
    return b"\n".join(ops)


def _image_ops() -> bytes:
    return b"q\n%d 0 0 %d 0 0 cm\n/Im0 Do\nQ" % (PAGE_W, PAGE_H)


def make_image_xobject_stream(page_text: str, zlevel: int = ZLIB_LEVEL) -> bytes:
    """The fake raster: Flate-compressed ``OCRSTUB1`` + utf-8 page text."""
    return zlib.compress(OCR_MAGIC + page_text.encode("utf-8"), zlevel)


def build_pdf(
    page_texts: list[str],
    text_layer: bool = True,
    image_layer: bool = True,
    flate: bool = False,
    zlevel: int = ZLIB_LEVEL,
) -> bytes:
    """Assemble a complete PDF.

    text_layer=True, image_layer=True  -> dual-layer (scan + OCR layer)
    text_layer=False, image_layer=True -> image-only (forces OCR route)
    flate=True                         -> FlateDecode content streams
    """
    objects: dict[int, bytes] = {}
    n_pages = len(page_texts)
    # object numbering: 1 catalog, 2 pages, 3 font, then per page:
    # page obj, content obj, [image obj]
    per_page = 3 if image_layer else 2
    page_ids = [4 + i * per_page for i in range(n_pages)]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    objects[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    for i, ptext in enumerate(page_texts):
        pid = page_ids[i]
        cid = pid + 1
        iid = pid + 2 if image_layer else None
        res = "/Font << /F1 3 0 R >>"
        if image_layer:
            res += f" /XObject << /Im0 {iid} 0 R >>"
        objects[pid] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
            f"/Resources << {res} >> /Contents {cid} 0 R >>"
        ).encode()

        parts = []
        if text_layer:
            parts.append(_text_layer_ops(ptext))
        if image_layer:
            parts.append(_image_ops())
        content = b"\n".join(parts)
        if flate:
            data = zlib.compress(content, zlevel)
            objects[cid] = (
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(data)
                + data
                + b"\nendstream"
            )
        else:
            objects[cid] = (
                b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream"
            )
        if image_layer:
            img = make_image_xobject_stream(ptext, zlevel)
            objects[iid] = (
                b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
                b"/Filter /FlateDecode /Length %d >>\nstream\n" % (PAGE_W, PAGE_H, len(img))
                + img
                + b"\nendstream"
            )

    # serialize with xref
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    max_obj = max(objects)
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (max_obj + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, max_obj + 1):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (max_obj + 1, xref_at)
    )
    return bytes(out)
