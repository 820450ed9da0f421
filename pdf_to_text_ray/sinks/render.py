"""Pure-stdlib byte renderers for the reference's final-output surface
(SURVEY.md §2 S9–S12 + ``export_all_outputs``).

None of reportlab / fpdf / python-docx / python-pptx exist in the
runtime, but the formats themselves don't need them: DOCX and PPTX are
zipped XML packages and a text-only PDF is a short object graph, so
this module writes all three directly with ``zipfile`` + string
templates — byte-deterministic (fixed zip timestamps, ``ZIP_STORED``
entries, stable part order), a pure function of the input text.

Reference semantics reproduced (file:line):

* ``generate_pdf`` — final_output_generator.py:11-19 (newlines become
  line breaks in one text flow; here: Helvetica 11pt, 54 lines/page).
* ``generate_docx`` — final_output_generator.py:25-30 (one paragraph
  per ``'\\n'``-split line, blank lines INCLUDED).
* ``generate_ppt`` — final_output_generator.py:36-57 (slides split on
  blank lines, first line is the title, the rest the body).
* ``create_docx_from_markdown`` — core_document_processing.py:381-407
  ('###'/'##'/'#' headings level 3/2/1, lines starting '*'/'-'/'•'
  are ``List Bullet`` paragraphs, blank lines SKIPPED).
* ``create_pptx_from_markdown`` — core_document_processing.py:299-379
  (slide split ``(?=\\n#+\\s)``, ``(#+)\\s*(.*)`` title cleanup,
  ``[Image of X]`` → bold "🖼️ [PROMPT: X]" line, bullet levels 0/1,
  widescreen 16:9 deck).
* ``export_all_outputs`` — final_output_generator.py:63-74 (writes
  ``<base>.pdf`` / ``.docx`` / ``.pptx`` per document into one output
  folder; here partitioned by ``doc_id % num_partitions`` so a rerun
  can resume per partition and no directory holds millions of files).

The Ray-side surface is ``render_outputs_batch`` (an ordinary
``map_batches`` body — rendering is stateless string work, so a task
pool, not an actor pool) and ``export_all_outputs`` (render + file
write + manifest).
"""

from __future__ import annotations

import io
import os
import re
import zipfile

import pyarrow as pa

# --------------------------------------------------------------- PDF

PDF_LINES_PER_PAGE = 54  # 11pt/12pt leading on a US-Letter text box


def _pdf_escape(line: str) -> bytes:
    """PDF string-literal escape, latin-1 charset (WinAnsi-compatible
    subset); characters outside latin-1 degrade to '?' the same way
    the reference's core-font path degrades unsupported glyphs."""
    raw = line.encode("latin-1", "replace")
    return raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def render_pdf_bytes(text: str) -> bytes:
    """Minimal valid PDF 1.4: Helvetica 11pt, one text line per input
    line (split on '\\n'), 54 lines per page, uncompressed content
    streams, correct xref offsets."""
    lines = text.split("\n")
    pages = [
        lines[i : i + PDF_LINES_PER_PAGE]
        for i in range(0, len(lines), PDF_LINES_PER_PAGE)
    ]
    npages = len(pages)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(npages))
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Count {npages} /Kids [{kids}] >>".encode(),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    for i, page_lines in enumerate(pages):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {5 + 2 * i} 0 R >>"
            ).encode()
        )
        stream = (
            b"BT /F1 11 Tf 12 TL 72 768 Td\n"
            + b"".join(b"(" + _pdf_escape(ln) + b") '\n" for ln in page_lines)
            + b"ET"
        )
        objs.append(
            f"<< /Length {len(stream)} >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0] * (len(objs) + 1)
    for n, body in enumerate(objs, start=1):
        offsets[n] = len(out)
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for n in range(1, len(objs) + 1):
        out += f"{offsets[n]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ------------------------------------------------------- OOXML shared

_ZIP_EPOCH = (1980, 1, 1, 0, 0, 0)


# XML 1.0 cannot represent most C0 controls (or 0xFFFE/0xFFFF) even
# escaped — python-docx raises on them; we drop them like a sanitizing
# writer must (tab/newline/CR are legal and kept).
_XML_ILLEGAL = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f￾￿\ud800-\udfff]"
)


def _xml_escape(s: str) -> str:
    s = _XML_ILLEGAL.sub("", s)
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _zip_bytes(parts: list[tuple[str, str]]) -> bytes:
    """Deterministic OPC container: fixed timestamp, stored entries,
    caller-defined part order."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for name, data in parts:
            info = zipfile.ZipInfo(name, date_time=_ZIP_EPOCH)
            z.writestr(info, data.encode("utf-8"))
    return buf.getvalue()


_XMLDECL = '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
_CT_NS = "http://schemas.openxmlformats.org/package/2006/content-types"
_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"
_REL_OFFDOC = (
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
)

# -------------------------------------------------------------- DOCX

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

_DOCX_CONTENT_TYPES = (
    _XMLDECL
    + f'<Types xmlns="{_CT_NS}">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    '<Override PartName="/word/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.styles+xml"/>'
    "</Types>"
)
_DOCX_ROOT_RELS = (
    _XMLDECL
    + f'<Relationships xmlns="{_REL_NS}">'
    f'<Relationship Id="rId1" Type="{_REL_OFFDOC}/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)
_DOCX_DOC_RELS = (
    _XMLDECL
    + f'<Relationships xmlns="{_REL_NS}">'
    f'<Relationship Id="rId1" Type="{_REL_OFFDOC}/styles" Target="styles.xml"/>'
    "</Relationships>"
)
_DOCX_STYLES = (
    _XMLDECL
    + f'<w:styles xmlns:w="{_W_NS}">'
    + "".join(
        f'<w:style w:type="paragraph" w:styleId="{sid}">'
        f'<w:name w:val="{name}"/></w:style>'
        for sid, name in [
            ("Heading1", "heading 1"),
            ("Heading2", "heading 2"),
            ("Heading3", "heading 3"),
            ("ListBullet", "List Bullet"),
        ]
    )
    + "</w:styles>"
)


def _docx_para(text: str, style: str | None = None) -> str:
    ppr = f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else ""
    return (
        f"<w:p>{ppr}<w:r>"
        f'<w:t xml:space="preserve">{_xml_escape(text)}</w:t>'
        "</w:r></w:p>"
    )


def _docx_package(paras: list[str]) -> bytes:
    document = (
        _XMLDECL
        + f'<w:document xmlns:w="{_W_NS}"><w:body>'
        + "".join(paras)
        + "<w:sectPr/></w:body></w:document>"
    )
    return _zip_bytes(
        [
            ("[Content_Types].xml", _DOCX_CONTENT_TYPES),
            ("_rels/.rels", _DOCX_ROOT_RELS),
            ("word/_rels/document.xml.rels", _DOCX_DOC_RELS),
            ("word/styles.xml", _DOCX_STYLES),
            ("word/document.xml", document),
        ]
    )


def render_docx_bytes(text: str) -> bytes:
    """``generate_docx`` semantics: one paragraph per '\\n'-split line
    (final_output_generator.py:25-30 — blank lines kept as empty
    paragraphs, exactly what python-docx add_paragraph('') does)."""
    return _docx_package([_docx_para(ln) for ln in text.split("\n")])


def render_docx_from_markdown(md: str) -> tuple[bytes, int, int, int]:
    """``create_docx_from_markdown`` semantics
    (core_document_processing.py:381-407): '###' → Heading3, '##' →
    Heading2, '#' → Heading1, lines starting '*'/'-'/'•' → List
    Bullet, blank lines skipped, everything else a plain paragraph.

    Returns (bytes, n_paragraphs, n_headings, n_bullets) — the counts
    are taken from the ACTUAL rendered package, giving the SQL oracle
    an independent arithmetic path to check against.
    """
    paras: list[str] = []
    n_headings = n_bullets = 0
    for raw in md.split("\n"):
        line = raw.strip()
        if not line:
            continue
        if line.startswith("###"):
            paras.append(_docx_para(line.lstrip("#").strip(), "Heading3"))
            n_headings += 1
        elif line.startswith("##"):
            paras.append(_docx_para(line.lstrip("#").strip(), "Heading2"))
            n_headings += 1
        elif line.startswith("#"):
            paras.append(_docx_para(line.lstrip("#").strip(), "Heading1"))
            n_headings += 1
        elif line.startswith(("*", "-", "•")):
            paras.append(_docx_para(line.lstrip("*-• ").strip(), "ListBullet"))
            n_bullets += 1
        else:
            paras.append(_docx_para(line))
    return _docx_package(paras), len(paras), n_headings, n_bullets


# -------------------------------------------------------------- PPTX

_A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
_P_NS = "http://schemas.openxmlformats.org/presentationml/2006/main"
_C_NS = "http://schemas.openxmlformats.org/drawingml/2006/chart"
_PPTX_XMLNS = (
    f'xmlns:a="{_A_NS}" xmlns:r="{_REL_OFFDOC.rsplit("/relationships", 1)[0]}'
    f'/relationships" xmlns:p="{_P_NS}"'
)

_PPTX_EMPTY_TREE = (
    "<p:spTree><p:nvGrpSpPr>"
    '<p:cNvPr id="1" name=""/><p:cNvGrpSpPr/><p:nvPr/>'
    "</p:nvGrpSpPr><p:grpSpPr/></p:spTree>"
)

_PPTX_MASTER = (
    _XMLDECL
    + f"<p:sldMaster {_PPTX_XMLNS}>"
    + f"<p:cSld>{_PPTX_EMPTY_TREE}</p:cSld>"
    '<p:clrMap bg1="lt1" tx1="dk1" bg2="lt2" tx2="dk2" accent1="accent1" '
    'accent2="accent2" accent3="accent3" accent4="accent4" accent5="accent5" '
    'accent6="accent6" hlink="hlink" folHlink="folHlink"/>'
    "<p:sldLayoutIdLst>"
    '<p:sldLayoutId id="2147483649" r:id="rId1"/>'
    "</p:sldLayoutIdLst></p:sldMaster>"
)
_PPTX_LAYOUT = (
    _XMLDECL
    + f"<p:sldLayout {_PPTX_XMLNS}>"
    + f"<p:cSld>{_PPTX_EMPTY_TREE}</p:cSld>"
    "<p:clrMapOvr><a:masterClrMapping/></p:clrMapOvr></p:sldLayout>"
)

# Compact but structurally complete theme (clrScheme + fontScheme +
# the three required fmtScheme style lists).
_FILL = '<a:solidFill><a:schemeClr val="phClr"/></a:solidFill>'
_LN = (
    '<a:ln w="9525"><a:solidFill><a:schemeClr val="phClr"/></a:solidFill></a:ln>'
)
_PPTX_THEME = (
    _XMLDECL
    + f'<a:theme xmlns:a="{_A_NS}" name="Office">'
    "<a:themeElements>"
    '<a:clrScheme name="Office">'
    '<a:dk1><a:sysClr val="windowText" lastClr="000000"/></a:dk1>'
    '<a:lt1><a:sysClr val="window" lastClr="FFFFFF"/></a:lt1>'
    '<a:dk2><a:srgbClr val="44546A"/></a:dk2>'
    '<a:lt2><a:srgbClr val="E7E6E6"/></a:lt2>'
    '<a:accent1><a:srgbClr val="4472C4"/></a:accent1>'
    '<a:accent2><a:srgbClr val="ED7D31"/></a:accent2>'
    '<a:accent3><a:srgbClr val="A5A5A5"/></a:accent3>'
    '<a:accent4><a:srgbClr val="FFC000"/></a:accent4>'
    '<a:accent5><a:srgbClr val="5B9BD5"/></a:accent5>'
    '<a:accent6><a:srgbClr val="70AD47"/></a:accent6>'
    '<a:hlink><a:srgbClr val="0563C1"/></a:hlink>'
    '<a:folHlink><a:srgbClr val="954F72"/></a:folHlink>'
    "</a:clrScheme>"
    '<a:fontScheme name="Office">'
    '<a:majorFont><a:latin typeface="Calibri Light"/><a:ea typeface=""/><a:cs typeface=""/></a:majorFont>'
    '<a:minorFont><a:latin typeface="Calibri"/><a:ea typeface=""/><a:cs typeface=""/></a:minorFont>'
    "</a:fontScheme>"
    '<a:fmtScheme name="Office">'
    f"<a:fillStyleLst>{_FILL}{_FILL}{_FILL}</a:fillStyleLst>"
    f"<a:lnStyleLst>{_LN}{_LN}{_LN}</a:lnStyleLst>"
    "<a:effectStyleLst><a:effectStyle><a:effectLst/></a:effectStyle>"
    "<a:effectStyle><a:effectLst/></a:effectStyle>"
    "<a:effectStyle><a:effectLst/></a:effectStyle></a:effectStyleLst>"
    f"<a:bgFillStyleLst>{_FILL}{_FILL}{_FILL}</a:bgFillStyleLst>"
    "</a:fmtScheme></a:themeElements></a:theme>"
)


# pptx_designer.py:14-51: named theme dicts driving slide colors and
# fonts. Same SHAPE as the reference's THEMES (the mechanism — a
# dict-selected palette injected into slide XML — is the reproduced
# surface; the palette values themselves are neutral placeholders).
PPTX_THEMES: dict[str, dict[str, str]] = {
    "default": {
        "bg": "FFFFFF", "title": "1F2937", "body": "374151",
        "accent": "4472C4", "font": "Calibri",
    },
    "dark": {
        "bg": "111827", "title": "F9FAFB", "body": "D1D5DB",
        "accent": "60A5FA", "font": "Calibri",
    },
    "corporate": {
        "bg": "F3F4F6", "title": "0C4A6E", "body": "1F2937",
        "accent": "0EA5E9", "font": "Georgia",
    },
}


def _pptx_slide_xml(
    title: str,
    paras: list[tuple[int, str, bool]],
    theme: dict[str, str] | None = None,
    n_charts: int = 0,
) -> str:
    """One slide: title placeholder + body placeholder. ``paras`` is
    [(level, text, bold)]. With ``theme``, the background fill and run
    colors/fonts come from the palette (pptx_designer.py:14-51
    mechanism); ``n_charts`` graphicFrames reference chart parts wired
    as rId2.. in the slide rels."""

    def rpr(bold: bool, color_key: str) -> str:
        if theme is None:
            return '<a:rPr b="1"/>' if bold else ""
        return (
            "<a:rPr" + (' b="1"' if bold else "") + ">"
            f'<a:solidFill><a:srgbClr val="{theme[color_key]}"/></a:solidFill>'
            f'<a:latin typeface="{theme["font"]}"/></a:rPr>'
        )

    body_paras = (
        "".join(
            "<a:p>"
            + (f'<a:pPr lvl="{lvl}"/>' if lvl else "")
            + "<a:r>"
            + rpr(bold, "body")
            + f"<a:t>{_xml_escape(text)}</a:t></a:r></a:p>"
            for lvl, text, bold in paras
        )
        or "<a:p/>"
    )
    bg = (
        (
            "<p:bg><p:bgPr><a:solidFill>"
            f'<a:srgbClr val="{theme["bg"]}"/></a:solidFill>'
            "<a:effectLst/></p:bgPr></p:bg>"
        )
        if theme is not None
        else ""
    )
    frames = "".join(
        "<p:graphicFrame><p:nvGraphicFramePr>"
        f'<p:cNvPr id="{4 + k}" name="Chart {k + 1}"/>'
        "<p:cNvGraphicFramePr/><p:nvPr/></p:nvGraphicFramePr>"
        '<p:xfrm><a:off x="838200" y="1825625"/>'
        '<a:ext cx="10515600" cy="4351338"/></p:xfrm>'
        f'<a:graphic><a:graphicData uri="{_C_NS}">'
        f'<c:chart xmlns:c="{_C_NS}" r:id="rId{2 + k}"/>'
        "</a:graphicData></a:graphic></p:graphicFrame>"
        for k in range(n_charts)
    )
    return (
        _XMLDECL
        + f"<p:sld {_PPTX_XMLNS}><p:cSld>" + bg + "<p:spTree>"
        "<p:nvGrpSpPr>"
        '<p:cNvPr id="1" name=""/><p:cNvGrpSpPr/><p:nvPr/>'
        "</p:nvGrpSpPr><p:grpSpPr/>"
        "<p:sp><p:nvSpPr>"
        '<p:cNvPr id="2" name="Title 1"/><p:cNvSpPr/>'
        '<p:nvPr><p:ph type="title"/></p:nvPr>'
        "</p:nvSpPr><p:spPr/><p:txBody><a:bodyPr/>"
        f"<a:p><a:r>{rpr(True, 'title') if theme else ''}"
        f"<a:t>{_xml_escape(title)}</a:t></a:r></a:p>"
        "</p:txBody></p:sp>"
        "<p:sp><p:nvSpPr>"
        '<p:cNvPr id="3" name="Content 2"/><p:cNvSpPr/>'
        '<p:nvPr><p:ph idx="1"/></p:nvPr>'
        "</p:nvSpPr><p:spPr/><p:txBody><a:bodyPr/>"
        + body_paras
        + "</p:txBody></p:sp>"
        + frames
        + "</p:spTree></p:cSld>"
        "<p:clrMapOvr><a:masterClrMapping/></p:clrMapOvr></p:sld>"
    )


_SLIDE_RELS = (
    _XMLDECL
    + f'<Relationships xmlns="{_REL_NS}">'
    f'<Relationship Id="rId1" Type="{_REL_OFFDOC}/slideLayout" Target="../slideLayouts/slideLayout1.xml"/>'
    "</Relationships>"
)


def _slide_rels_with_charts(chart_part_nos: list[int]) -> str:
    """Slide rels: layout + one chart relationship per referenced
    chart part (rId2.. in graphicFrame order)."""
    rels = "".join(
        f'<Relationship Id="rId{2 + k}" Type="{_REL_OFFDOC}/chart" '
        f'Target="../charts/chart{no}.xml"/>'
        for k, no in enumerate(chart_part_nos)
    )
    return (
        _XMLDECL
        + f'<Relationships xmlns="{_REL_NS}">'
        f'<Relationship Id="rId1" Type="{_REL_OFFDOC}/slideLayout" Target="../slideLayouts/slideLayout1.xml"/>'
        + rels
        + "</Relationships>"
    )


def _chart_part_xml(
    title: str,
    series: str,
    points: list[tuple[str, float]],
    accent: str,
) -> str:
    """A real OOXML bar-chart part (c:chartSpace / c:barChart / c:ser
    with cached categories and values) — the deterministic analogue of
    pptx_designer.py:131-175's chart insertion. Values render via
    repr(float) so the part is byte-deterministic."""
    n = len(points)
    cats = "".join(
        f'<c:pt idx="{i}"><c:v>{_xml_escape(c)}</c:v></c:pt>'
        for i, (c, _) in enumerate(points)
    )
    vals = "".join(
        f'<c:pt idx="{i}"><c:v>{v!r}</c:v></c:pt>'
        for i, (_, v) in enumerate(points)
    )
    return (
        _XMLDECL
        + f'<c:chartSpace xmlns:c="{_C_NS}" xmlns:a="{_A_NS}" '
        f'xmlns:r="{_REL_OFFDOC.rsplit("/relationships", 1)[0]}/relationships">'
        "<c:chart><c:title><c:tx><c:rich><a:bodyPr/><a:lstStyle/>"
        f"<a:p><a:r><a:t>{_xml_escape(title)}</a:t></a:r></a:p>"
        "</c:rich></c:tx><c:overlay val=\"0\"/></c:title>"
        "<c:plotArea><c:layout/>"
        '<c:barChart><c:barDir val="col"/><c:grouping val="clustered"/>'
        '<c:varyColors val="0"/>'
        '<c:ser><c:idx val="0"/><c:order val="0"/>'
        "<c:tx><c:strRef><c:f>Sheet1!$B$1</c:f><c:strCache>"
        '<c:ptCount val="1"/><c:pt idx="0">'
        f"<c:v>{_xml_escape(series)}</c:v></c:pt></c:strCache></c:strRef></c:tx>"
        "<c:spPr><a:solidFill>"
        f'<a:srgbClr val="{accent}"/></a:solidFill></c:spPr>'
        "<c:cat><c:strRef><c:f>Sheet1!$A$2:$A${}</c:f><c:strCache>".replace(
            "{}", str(n + 1)
        )
        + f'<c:ptCount val="{n}"/>' + cats + "</c:strCache></c:strRef></c:cat>"
        "<c:val><c:numRef><c:f>Sheet1!$B$2:$B${}</c:f><c:numCache>".replace(
            "{}", str(n + 1)
        )
        + f'<c:ptCount val="{n}"/>' + vals + "</c:numCache></c:numRef></c:val>"
        "</c:ser>"
        '<c:axId val="111111111"/><c:axId val="222222222"/></c:barChart>'
        '<c:catAx><c:axId val="111111111"/>'
        '<c:scaling><c:orientation val="minMax"/></c:scaling>'
        '<c:delete val="0"/><c:axPos val="b"/>'
        '<c:crossAx val="222222222"/></c:catAx>'
        '<c:valAx><c:axId val="222222222"/>'
        '<c:scaling><c:orientation val="minMax"/></c:scaling>'
        '<c:delete val="0"/><c:axPos val="l"/>'
        '<c:crossAx val="111111111"/></c:valAx>'
        "</c:plotArea><c:plotVisOnly val=\"1\"/></c:chart></c:chartSpace>"
    )


def _pptx_package(
    slides: list[tuple[str, list[tuple[int, str, bool]]]],
    theme: dict[str, str] | None = None,
    slide_charts: list[list[tuple[str, str, list[tuple[str, float]]]]] | None = None,
) -> bytes:
    """OPC package. ``slide_charts`` (parallel to ``slides``) carries
    per-slide parsed chart tuples (title, series, points); each becomes
    a real chart part wired through slide rels + content types."""
    n = len(slides)
    if slide_charts is None:
        slide_charts = [[] for _ in range(n)]
    # global chart part numbering in slide order
    chart_nos: list[list[int]] = []
    next_no = 1
    for charts in slide_charts:
        nos = list(range(next_no, next_no + len(charts)))
        chart_nos.append(nos)
        next_no += len(charts)
    total_charts = next_no - 1
    ct = (
        _XMLDECL
        + f'<Types xmlns="{_CT_NS}">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
        '<Override PartName="/ppt/slideMasters/slideMaster1.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.slideMaster+xml"/>'
        '<Override PartName="/ppt/slideLayouts/slideLayout1.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.slideLayout+xml"/>'
        '<Override PartName="/ppt/theme/theme1.xml" ContentType="application/vnd.openxmlformats-officedocument.theme+xml"/>'
        + "".join(
            f'<Override PartName="/ppt/slides/slide{i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>'
            for i in range(n)
        )
        + "".join(
            f'<Override PartName="/ppt/charts/chart{k + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.drawingml.chart+xml"/>'
            for k in range(total_charts)
        )
        + "</Types>"
    )
    root_rels = (
        _XMLDECL
        + f'<Relationships xmlns="{_REL_NS}">'
        f'<Relationship Id="rId1" Type="{_REL_OFFDOC}/officeDocument" Target="ppt/presentation.xml"/>'
        "</Relationships>"
    )
    pres = (
        _XMLDECL
        + f"<p:presentation {_PPTX_XMLNS}>"
        "<p:sldMasterIdLst>"
        '<p:sldMasterId id="2147483648" r:id="rId1"/>'
        "</p:sldMasterIdLst><p:sldIdLst>"
        + "".join(
            f'<p:sldId id="{256 + i}" r:id="rId{2 + i}"/>' for i in range(n)
        )
        + "</p:sldIdLst>"
        # widescreen 16:9 — the reference sets 13.33in x 7.5in
        # (core_document_processing.py:306-308)
        '<p:sldSz cx="12192000" cy="6858000"/>'
        '<p:notesSz cx="6858000" cy="9144000"/></p:presentation>'
    )
    pres_rels = (
        _XMLDECL
        + f'<Relationships xmlns="{_REL_NS}">'
        f'<Relationship Id="rId1" Type="{_REL_OFFDOC}/slideMaster" Target="slideMasters/slideMaster1.xml"/>'
        + "".join(
            f'<Relationship Id="rId{2 + i}" Type="{_REL_OFFDOC}/slide" Target="slides/slide{i + 1}.xml"/>'
            for i in range(n)
        )
        + "</Relationships>"
    )
    master_rels = (
        _XMLDECL
        + f'<Relationships xmlns="{_REL_NS}">'
        f'<Relationship Id="rId1" Type="{_REL_OFFDOC}/slideLayout" Target="../slideLayouts/slideLayout1.xml"/>'
        f'<Relationship Id="rId2" Type="{_REL_OFFDOC}/theme" Target="../theme/theme1.xml"/>'
        "</Relationships>"
    )
    layout_rels = (
        _XMLDECL
        + f'<Relationships xmlns="{_REL_NS}">'
        f'<Relationship Id="rId1" Type="{_REL_OFFDOC}/slideMaster" Target="../slideMasters/slideMaster1.xml"/>'
        "</Relationships>"
    )
    parts: list[tuple[str, str]] = [
        ("[Content_Types].xml", ct),
        ("_rels/.rels", root_rels),
        ("ppt/presentation.xml", pres),
        ("ppt/_rels/presentation.xml.rels", pres_rels),
        ("ppt/slideMasters/slideMaster1.xml", _PPTX_MASTER),
        ("ppt/slideMasters/_rels/slideMaster1.xml.rels", master_rels),
        ("ppt/slideLayouts/slideLayout1.xml", _PPTX_LAYOUT),
        ("ppt/slideLayouts/_rels/slideLayout1.xml.rels", layout_rels),
        ("ppt/theme/theme1.xml", _PPTX_THEME),
    ]
    accent = (theme or PPTX_THEMES["default"])["accent"]
    for i, (title, paras) in enumerate(slides):
        charts = slide_charts[i]
        parts.append(
            (
                f"ppt/slides/slide{i + 1}.xml",
                _pptx_slide_xml(title, paras, theme, len(charts)),
            )
        )
        parts.append(
            (
                f"ppt/slides/_rels/slide{i + 1}.xml.rels",
                _slide_rels_with_charts(chart_nos[i]) if charts else _SLIDE_RELS,
            )
        )
        for no, (ctitle, cseries, pts) in zip(chart_nos[i], charts):
            parts.append(
                (
                    f"ppt/charts/chart{no}.xml",
                    _chart_part_xml(ctitle, cseries, pts, accent),
                )
            )
    return _zip_bytes(parts)


def render_pptx_bytes(text: str) -> bytes:
    """``generate_ppt`` semantics (final_output_generator.py:36-57):
    slides = text.split('\\n\\n'); per slide the stripped first line is
    the title, remaining lines the body (level-0 paragraphs)."""
    slides: list[tuple[str, list[tuple[int, str, bool]]]] = []
    for block in text.split("\n\n"):
        lines = block.strip().split("\n")
        title = lines[0] if lines else "Slide"
        body = [(0, ln, False) for ln in lines[1:]]
        slides.append((title, body))
    return _pptx_package(slides)


# NB: deliberately NOT shared with stages/markdown.parse_markdown —
# that module reproduces the docx-parser line grammar
# (core_document_processing.py:381-407, headings checked first) while
# this renderer reproduces the pptx-parser grammar (ibid. 341-372,
# image tag checked first, '###' only bolds when no space follows).
# The two reference functions genuinely classify lines differently;
# keep each copy byte-faithful to its own source.
_RE_SLIDE_SPLIT = re.compile(r"(?=\n#+\s)")
_RE_TITLE = re.compile(r"(#+)\s*(.*)")
_RE_IMAGE = re.compile(r"\[Image of (.+?)\]", re.IGNORECASE)
_RE_BULLET0 = re.compile(r"^[\*•-]\s")
_RE_BULLET1 = re.compile(r"^[\*•-]{2,}")


def render_pptx_from_markdown(md: str) -> tuple[bytes, int, int]:
    """``create_pptx_from_markdown`` semantics
    (core_document_processing.py:299-379): slide split on the
    ``(?=\\n#+\\s)`` lookahead, title cleaned of '#', image tags
    rendered as bold "🖼️ [PROMPT: topic]" lines, bullet levels 0/1,
    '###' body lines bold.

    Returns (bytes, n_slides, n_image_prompts) from the actual render.
    """
    blocks = [s.strip() for s in _RE_SLIDE_SPLIT.split(md) if s.strip()]
    slides: list[tuple[str, list[tuple[int, str, bool]]]] = []
    n_images = 0
    for block in blocks:
        lines = block.split("\n")
        title_line = lines[0].strip()
        m = _RE_TITLE.match(title_line)
        title = m.group(2).strip() if m else title_line
        paras: list[tuple[int, str, bool]] = []
        for raw in lines[1:]:
            line = raw.strip()
            if not line:
                continue
            img = _RE_IMAGE.search(line)
            if img:
                paras.append((0, f"🖼️ [PROMPT: {img.group(1).strip()}]", True))
                n_images += 1
            elif _RE_BULLET0.match(line):
                paras.append((0, _RE_BULLET0.sub("", line).strip(), False))
            elif _RE_BULLET1.match(line):
                # indent-based level-1 can't trigger post-strip; the
                # '**'-prefix form is the live level-1 path
                paras.append((1, line.lstrip("*•- \t").strip(), False))
            elif line.startswith("###"):
                paras.append((0, line.lstrip("#").strip(), True))
            else:
                paras.append((0, line, False))
        slides.append((title, paras))
    return _pptx_package(slides), len(slides), n_images


_RE_CHART = re.compile(r"\[CHART:\s*(.+?)\]", re.IGNORECASE)


def render_pptx_with_style(
    md: str, theme_name: str
) -> tuple[bytes, int, int, int]:
    """``create_pptx_with_style`` semantics (pptx_designer.py:177-370
    with the :14-51 theme dict and :131-175 chart insertion): markdown
    slides as in render_pptx_from_markdown, but runs/backgrounds carry
    the named theme's palette and every ``[CHART: <grammar>]`` line
    becomes a REAL bar-chart part (c:chartSpace) wired into its slide
    via a graphicFrame. Unparseable chart strings (< 3 comma parts)
    are dropped like the reference's failure path.

    Returns (bytes, n_slides, n_charts, n_chart_points)."""
    from ..stages.markdown import parse_chart_string

    theme = PPTX_THEMES[theme_name]
    blocks = [s.strip() for s in _RE_SLIDE_SPLIT.split(md) if s.strip()]
    slides: list[tuple[str, list[tuple[int, str, bool]]]] = []
    slide_charts: list[list[tuple[str, str, list[tuple[str, float]]]]] = []
    n_charts = n_points = 0
    for block in blocks:
        lines = block.split("\n")
        title_line = lines[0].strip()
        m = _RE_TITLE.match(title_line)
        title = m.group(2).strip() if m else title_line
        paras: list[tuple[int, str, bool]] = []
        charts: list[tuple[str, str, list[tuple[str, float]]]] = []
        for raw in lines[1:]:
            line = raw.strip()
            if not line:
                continue
            chart = _RE_CHART.search(line)
            if chart:
                parsed = parse_chart_string(chart.group(1))
                if parsed is not None:
                    charts.append(parsed)
                    n_charts += 1
                    n_points += len(parsed[2])
                continue
            img = _RE_IMAGE.search(line)
            if img:
                paras.append((0, f"🖼️ [PROMPT: {img.group(1).strip()}]", True))
            elif _RE_BULLET0.match(line):
                paras.append((0, _RE_BULLET0.sub("", line).strip(), False))
            elif _RE_BULLET1.match(line):
                paras.append((1, line.lstrip("*•- \t").strip(), False))
            elif line.startswith("###"):
                paras.append((0, line.lstrip("#").strip(), True))
            else:
                paras.append((0, line, False))
        slides.append((title, paras))
        slide_charts.append(charts)
    if not slides:  # chart-only / empty markdown still yields one slide
        slides, slide_charts = [("Content", [])], [[]]
    data = _pptx_package(slides, theme, slide_charts)
    return data, len(slides), n_charts, n_points


def render_pptx_styled_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> themed+charted PPTX bytes and the structural
    counts (theme keyed by doc_id, one synthetic chart line appended to
    the markdown — the chart_parse construction-oracle pattern)."""
    from ..stages.markdown import synth_chart_string, synth_markdown

    names = list(PPTX_THEMES)
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    themes, blobs, n_slides, n_charts, n_points, n_bytes = (
        [], [], [], [], [], [],
    )
    for did, text in zip(ids, texts):
        theme = names[did % len(names)]
        md = synth_markdown(text) + f"\n[CHART: {synth_chart_string(did)}]"
        data, ns, nc, np_ = render_pptx_with_style(md, theme)
        themes.append(theme)
        blobs.append(data)
        n_slides.append(ns)
        n_charts.append(nc)
        n_points.append(np_)
        n_bytes.append(len(data))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "theme": pa.array(themes, pa.string()),
            "pptx": pa.array(blobs, pa.binary()),
            "n_slides": pa.array(n_slides, pa.int64()),
            "n_charts": pa.array(n_charts, pa.int64()),
            "n_chart_points": pa.array(n_points, pa.int64()),
            "n_bytes": pa.array(n_bytes, pa.int64()),
        }
    )


# ------------------------------------------------- Ray Data surface


def render_outputs_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> rendered PDF/DOCX/PPTX bytes of the
    document's markdown report + the structural counts the renderers
    observed. Counts come from the real renders, so the SQL oracle
    checks renderer internals through an independent arithmetic path.
    """
    from ..stages.markdown import synth_markdown

    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    pdfs, docxs, pptxs = [], [], []
    n_paras, n_heads, n_bulls, n_slides, n_imgs, pdf_pages = (
        [], [], [], [], [], [],
    )
    for text in texts:
        md = synth_markdown(text)
        pdf = render_pdf_bytes(md)
        docx, paras, heads, bulls = render_docx_from_markdown(md)
        pptx, slides, imgs = render_pptx_from_markdown(md)
        pdfs.append(pdf)
        docxs.append(docx)
        pptxs.append(pptx)
        n_paras.append(paras)
        n_heads.append(heads)
        n_bulls.append(bulls)
        n_slides.append(slides)
        n_imgs.append(imgs)
        pdf_pages.append(
            (len(md.split("\n")) + PDF_LINES_PER_PAGE - 1) // PDF_LINES_PER_PAGE
        )
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "pdf": pa.array(pdfs, pa.binary()),
            "docx": pa.array(docxs, pa.binary()),
            "pptx": pa.array(pptxs, pa.binary()),
            "docx_paragraphs": pa.array(n_paras, pa.int64()),
            "docx_headings": pa.array(n_heads, pa.int64()),
            "docx_bullets": pa.array(n_bulls, pa.int64()),
            "pptx_slides": pa.array(n_slides, pa.int64()),
            "pptx_image_prompts": pa.array(n_imgs, pa.int64()),
            "pdf_pages": pa.array(pdf_pages, pa.int64()),
        }
    )


def export_all_outputs(
    ds, output_dir: str, num_partitions: int = 64, resume: bool = False
):
    """Distributed ``export_all_outputs``: render every document's
    three artifacts and write ``part=<pid>/doc_<doc_id>.{pdf,docx,pptx}``
    (pid = doc_id % num_partitions — bounded directory fan-out, and a
    rerun overwrites atomically via tmp+rename so partial runs never
    leave torn files). With ``resume=True`` a doc whose three artifacts
    already exist non-empty is not re-rendered (sizes read from disk),
    so an interrupted export restarts where it stopped. Returns the
    manifest Dataset (doc_id, partition, pdf_bytes, docx_bytes,
    pptx_bytes)."""

    def write_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        paths = {}
        done_rows = set()
        for row, did in enumerate(ids):
            pid = did % num_partitions
            part_dir = os.path.join(output_dir, f"part={pid}")
            paths[row] = (
                pid,
                [os.path.join(part_dir, f"doc_{did}.{ext}")
                 for ext in ("pdf", "docx", "pptx")],
            )
            if resume:
                try:
                    if all(os.path.getsize(p) > 0 for p in paths[row][1]):
                        done_rows.add(row)
                except OSError:
                    pass
        todo = [r for r in range(len(ids)) if r not in done_rows]
        rendered = (
            render_outputs_batch(batch.take(todo)) if todo else None
        )
        parts_col, sizes = [], {"pdf": [], "docx": [], "pptx": []}
        todo_pos = {r: i for i, r in enumerate(todo)}
        for row, did in enumerate(ids):
            pid, finals = paths[row]
            if row in done_rows:
                for ext, final in zip(("pdf", "docx", "pptx"), finals):
                    sizes[ext].append(os.path.getsize(final))
            else:
                os.makedirs(os.path.dirname(finals[0]), exist_ok=True)
                i = todo_pos[row]
                for ext, final in zip(("pdf", "docx", "pptx"), finals):
                    blob = rendered[ext][i].as_py()
                    tmp = final + ".tmp"
                    with open(tmp, "wb") as f:
                        f.write(blob)
                    os.replace(tmp, final)
                    sizes[ext].append(len(blob))
            parts_col.append(pid)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "partition": pa.array(parts_col, pa.int64()),
                "pdf_bytes": pa.array(sizes["pdf"], pa.int64()),
                "docx_bytes": pa.array(sizes["docx"], pa.int64()),
                "pptx_bytes": pa.array(sizes["pptx"], pa.int64()),
            }
        )

    return ds.map_batches(write_batch, batch_format="pyarrow")
