"""Pure-Python PDF layout parser (pdfminer-style, bounded scope).

Glyph-run → line → page assembly with reading-order sort, per the
north star: tokenize content streams (``BT/ET``, ``Tf``, ``Tm``,
``Td/TD/T*``, ``Tj/TJ``, Flate or raw), collect positioned text runs,
sort by (-y, x), join runs within a line, join lines with ``\\n``.

Routing reproduces the reference's 250-char rule byte-for-byte: a page
whose whitespace-stripped text-layer length is strictly > threshold
keeps the digital text (stripped — core_document_processing.py:76-78);
otherwise the page is routed to OCR with the page raster as payload
(core_document_processing.py:79-83). Anything unparseable degrades to
``parse_ok=False`` + error string, mirroring the reference's
log-and-continue (2_OpenCV_OCR/main.py:77-78) — a bad document must
never poison its batch.

Scope: the constructs emitted by pdfgen.py plus graceful failure on
everything else (encrypted PDFs, xref streams, exotic filters).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

from ..functions.scalar import meaningful_length

_RE_OBJ = re.compile(rb"(\d+)\s+0\s+obj\b")
_RE_PAGES_REF = re.compile(rb"/Pages\s+(\d+)\s+0\s+R")
_RE_KIDS = re.compile(rb"/Kids\s*\[([^\]]*)\]")
_RE_REF = re.compile(rb"(\d+)\s+0\s+R")
_RE_CONTENTS = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_RE_IM0 = re.compile(rb"/Im0\s+(\d+)\s+0\s+R")
_RE_LENGTH = re.compile(rb"/Length\s+(\d+)")
_RE_FLATE = re.compile(rb"/Filter\s*/FlateDecode")
_RE_TYPE_PAGE = re.compile(rb"/Type\s*/Page\b")

_STR_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


class PdfParseError(Exception):
    pass


@dataclass
class _Run:
    x: float
    y: float
    text: str


def _scan_objects(data: bytes) -> dict[int, bytes]:
    """Map object number -> body bytes (between ``N 0 obj`` and ``endobj``).

    Robust linear scan; we deliberately do not trust the xref table
    (truncated/garbled tails should still parse as far as possible).
    """
    objs: dict[int, bytes] = {}
    for m in _RE_OBJ.finditer(data):
        end = data.find(b"endobj", m.end())
        if end == -1:
            end = len(data)
        objs[int(m.group(1))] = data[m.end():end]
    if not objs:
        raise PdfParseError("no PDF objects found")
    return objs


def _stream_bytes(body: bytes) -> bytes:
    """Extract (and inflate if FlateDecode) a stream from an object body."""
    i = body.find(b"stream")
    if i == -1:
        raise PdfParseError("object has no stream")
    j = i + len(b"stream")
    if body[j : j + 2] == b"\r\n":
        j += 2
    elif body[j : j + 1] == b"\n":
        j += 1
    mlen = _RE_LENGTH.search(body[:i])
    if mlen:
        raw = body[j : j + int(mlen.group(1))]
    else:
        k = body.rfind(b"endstream")
        raw = body[j:k].rstrip(b"\r\n")
    if _RE_FLATE.search(body[:i]):
        try:
            raw = zlib.decompress(raw)
        except zlib.error as e:
            raise PdfParseError(f"flate error: {e}") from e
    return raw


def _page_order(objs: dict[int, bytes]) -> list[int]:
    """Page object numbers in document order (catalog → pages → kids),
    falling back to numeric order of /Type /Page objects."""
    root = None
    for body in objs.values():
        if b"/Type" in body and b"/Catalog" in body:
            m = _RE_PAGES_REF.search(body)
            if m:
                root = int(m.group(1))
            break
    if root is not None and root in objs:
        m = _RE_KIDS.search(objs[root])
        if m:
            kids = [int(r.group(1)) for r in _RE_REF.finditer(m.group(1))]
            if kids:
                return [k for k in kids if k in objs]
    return sorted(n for n, b in objs.items() if _RE_TYPE_PAGE.search(b))


# position-anchored patterns: .match(data, i) never copies the buffer
# (the naive re.match(pat, data[i:]) slice made tokenizing O(n^2))
_RE_TOK_NUM = re.compile(rb"[-+0-9.]+")
_RE_TOK_NAME = re.compile(rb"/[^\s\[\]<>()/%]*")
_RE_TOK_OP = re.compile(rb"[A-Za-z'\"*]+")
_WS_SET = frozenset(b" \t\r\n\x00")
_NUM_START = frozenset(b"-+.0123456789")


def _tokenize_content(data: bytes):
    """Yield ('str', s) / ('num', f) / ('op', name) / ('arr', list) tokens."""
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c in _WS_SET:
            i += 1
        elif c == 0x25:  # '%' comment to EOL
            j = data.find(b"\n", i)
            i = n if j == -1 else j + 1
        elif c == 0x28:  # '('
            s, i = _parse_string(data, i)
            yield ("str", s)
        elif c == 0x5B:  # '['
            arr = []
            i += 1
            while i < n and data[i] != 0x5D:  # ']'
                c2 = data[i]
                if c2 in _WS_SET:
                    i += 1
                elif c2 == 0x28:
                    s, i = _parse_string(data, i)
                    arr.append(("str", s))
                else:
                    m = _RE_TOK_NUM.match(data, i)
                    if m:
                        arr.append(("num", float(m.group(0))))
                        i = m.end()
                    else:
                        i += 1  # unknown token inside array: skip
            i += 1
            yield ("arr", arr)
        elif c == 0x2F:  # '/'
            m = _RE_TOK_NAME.match(data, i)
            i = m.end()
            yield ("name", m.group(0).decode("latin-1"))
        elif c in _NUM_START:
            m = _RE_TOK_NUM.match(data, i)
            i = m.end()
            try:
                yield ("num", float(m.group(0)))
            except ValueError:
                pass
        elif c == 0x3C:  # '<': hex string or dict — skip to close
            if data[i : i + 2] == b"<<":
                j = data.find(b">>", i)
                i = n if j == -1 else j + 2
            else:
                j = data.find(b">", i)
                i = n if j == -1 else j + 1
        else:
            m = _RE_TOK_OP.match(data, i)
            if m:
                i = m.end()
                yield ("op", m.group(0).decode("latin-1"))
            else:
                i += 1


def _parse_string(data: bytes, i: int) -> tuple[str, int]:
    """PDF literal string with escapes and balanced parens; returns
    (decoded_str, index_after)."""
    assert data[i : i + 1] == b"("
    i += 1
    out: list[str] = []
    depth = 1
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _STR_ESCAPES:
                out.append(_STR_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal
                oct_digits = ""
                while i < n and len(oct_digits) < 3 and 0x30 <= data[i] <= 0x37:
                    oct_digits += chr(data[i])
                    i += 1
                out.append(chr(int(oct_digits, 8)))
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(chr(e))
                i += 1
        elif b == 0x28:  # (
            depth += 1
            out.append("(")
            i += 1
        elif b == 0x29:  # )
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
            out.append(")")
            i += 1
        else:
            # bulk-copy the run up to the next special byte instead of
            # appending char-by-char
            m = _RE_STR_PLAIN.match(data, i)
            out.append(m.group(0).decode("latin-1"))
            i = m.end()
    return "".join(out), i


_RE_STR_PLAIN = re.compile(rb"[^\\()]+")


def extract_runs(content: bytes) -> list[_Run]:
    """Interpret text-positioning/showing operators into positioned runs.

    Supported: BT/ET, Tf, Tm (sets absolute position; rotation ignored),
    Td (translate line matrix), TD (Td + set leading), TL, T* (next line
    by leading), Tj, TJ, ' (move + show). Graphics ops are ignored.
    """
    runs: list[_Run] = []
    stack: list = []
    x = y = 0.0
    lx = ly = 0.0  # line-start position (text line matrix translation)
    leading = 0.0
    for kind, val in _tokenize_content(content):
        if kind in ("num", "str", "name", "arr"):
            stack.append((kind, val))
            continue
        op = val
        if op == "BT":
            x = y = lx = ly = 0.0
        elif op == "Tm" and len(stack) >= 6:
            e = stack[-2][1]
            f = stack[-1][1]
            x = lx = float(e)
            y = ly = float(f)
        elif op in ("Td", "TD") and len(stack) >= 2:
            tx = float(stack[-2][1])
            ty = float(stack[-1][1])
            if op == "TD":
                leading = -ty
            lx += tx
            ly += ty
            x, y = lx, ly
        elif op == "TL" and stack:
            leading = float(stack[-1][1])
        elif op == "T*":
            ly -= leading
            x, y = lx, ly
        elif op == "Tj" and stack and stack[-1][0] == "str":
            runs.append(_Run(x, y, stack[-1][1]))
        elif op == "'" and stack and stack[-1][0] == "str":
            ly -= leading
            x, y = lx, ly
            runs.append(_Run(x, y, stack[-1][1]))
        elif op == "TJ" and stack and stack[-1][0] == "arr":
            text = "".join(v for k, v in stack[-1][1] if k == "str")
            if text:
                runs.append(_Run(x, y, text))
        stack = []
    return runs


def assemble_text(
    runs: list[_Run], y_tol: float = 2.0, line_separator: str = " "
) -> str:
    """Reading-order assembly: cluster runs into lines by y (tolerance),
    sort lines top-to-bottom (-y), runs within a line left-to-right (x),
    concatenate runs (generator embeds explicit spaces), join lines with
    ``line_separator``.

    The default separator is a single space: the synthetic corpus
    encodes source text losslessly across line wraps, so a space
    reconstructs the original bytes exactly (the engine's byte-identity
    contract). Pass "\\n" for the pdfminer/PyMuPDF visual-line
    convention.
    """
    if not runs:
        return ""
    lines: list[list[_Run]] = []
    for run in sorted(runs, key=lambda r: (-r.y, r.x)):
        if lines and abs(lines[-1][0].y - run.y) <= y_tol:
            lines[-1].append(run)
        else:
            lines.append([run])
    return line_separator.join(
        "".join(r.text for r in sorted(line, key=lambda r: r.x)) for line in lines
    )


def parse_pdf(
    data: bytes, text_layer_threshold: int = 250
) -> list[dict]:
    """Parse a PDF payload into per-page records.

    Returns [{page_no, page_text|None, route, ocr_payload|None}];
    route 'text_layer' when the page's whitespace-stripped text length
    is strictly > threshold (core_document_processing.py:76), else
    'ocr' with the page's image stream as payload.
    Raises PdfParseError when the container is unparseable.
    """
    objs = _scan_objects(data)
    pages = _page_order(objs)
    if not pages:
        raise PdfParseError("no pages")
    out = []
    for idx, pnum in enumerate(pages):
        body = objs[pnum]
        text = ""
        mc = _RE_CONTENTS.search(body)
        if mc and int(mc.group(1)) in objs:
            content = _stream_bytes(objs[int(mc.group(1))])
            text = assemble_text(extract_runs(content))
        if meaningful_length(text) > text_layer_threshold:
            # digital text is sufficient; stripped like the reference
            # (core_document_processing.py:78: raw_pdf_text.strip())
            out.append(
                {
                    "page_no": idx + 1,
                    "page_text": text.strip(),
                    "route": "text_layer",
                    "ocr_payload": None,
                }
            )
        else:
            payload = None
            mi = _RE_IM0.search(body)
            if mi and int(mi.group(1)) in objs:
                try:
                    payload = _stream_bytes(objs[int(mi.group(1))])
                except PdfParseError:
                    payload = None
            out.append(
                {
                    "page_no": idx + 1,
                    "page_text": None,
                    "route": "ocr",
                    "ocr_payload": payload,
                }
            )
    return out
