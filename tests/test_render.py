"""Pure-stdlib PDF/DOCX/PPTX renderers (SURVEY.md §2 S9-S12 +
export_all_outputs) — container validity, reference-semantics text
placement, byte determinism, and the distributed export sink."""

import io
import re
import xml.etree.ElementTree as ET
import zipfile

import pyarrow as pa
import pytest

from pdf_to_text_ray.sinks.render import (
    PDF_LINES_PER_PAGE,
    export_all_outputs,
    render_docx_bytes,
    render_docx_from_markdown,
    render_outputs_batch,
    render_pdf_bytes,
    render_pptx_bytes,
    render_pptx_from_markdown,
)

W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"


# ------------------------------------------------------------------ PDF

def _pdf_text_lines(pdf: bytes) -> list[str]:
    """Recover the shown text lines from the uncompressed content
    streams (every shown string is a `(...) '` operator)."""
    out = []
    for stream in re.findall(rb"stream\n(.*?)\nendstream", pdf, re.S):
        for tok in re.findall(rb"\((.*?)(?<!\\)\) '", stream, re.S):
            out.append(
                tok.replace(b"\\(", b"(")
                .replace(b"\\)", b")")
                .replace(b"\\\\", b"\\")
                .decode("latin-1")
            )
    return out


def test_pdf_structure_and_roundtrip():
    text = "line one\nline (two) with parens\nback\\slash\nlast"
    pdf = render_pdf_bytes(text)
    assert pdf.startswith(b"%PDF-1.4") and pdf.rstrip().endswith(b"%%EOF")
    # xref offsets must point exactly at "N 0 obj"
    xref = re.search(rb"xref\n0 (\d+)\n", pdf)
    nobjs = int(xref.group(1)) - 1
    table = pdf[xref.end() :].split(b"\n")[1 : nobjs + 1]
    for n, row in enumerate(table, start=1):
        off = int(row.split(b" ")[0])
        assert pdf[off:].startswith(f"{n} 0 obj".encode())
    # startxref points at the xref table
    startxref = int(re.search(rb"startxref\n(\d+)", pdf).group(1))
    assert pdf[startxref:].startswith(b"xref")
    assert _pdf_text_lines(pdf) == text.split("\n")


def test_pdf_pagination():
    n = PDF_LINES_PER_PAGE * 2 + 3  # 3 pages
    pdf = render_pdf_bytes("\n".join(f"l{i}" for i in range(n)))
    assert pdf.count(b"/Type /Page ") == 3
    assert b"/Count 3" in pdf
    assert len(_pdf_text_lines(pdf)) == n


def test_pdf_non_latin_degrades_not_crashes():
    pdf = render_pdf_bytes("café 中文")
    assert _pdf_text_lines(pdf) == ["café ??"]


# ----------------------------------------------------------------- DOCX

def _zip_parts(blob: bytes) -> dict[str, bytes]:
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        assert z.testzip() is None
        return {n: z.read(n) for n in z.namelist()}


def _docx_paras(blob: bytes) -> list[tuple[str, str | None]]:
    """[(text, style)] per w:p in document.xml."""
    doc = ET.fromstring(_zip_parts(blob)["word/document.xml"])
    out = []
    for p in doc.iter(f"{W}p"):
        style = p.find(f"{W}pPr/{W}pStyle")
        text = "".join(t.text or "" for t in p.iter(f"{W}t"))
        out.append((text, style.get(f"{W}val") if style is not None else None))
    return out


def test_docx_plain_one_para_per_line():
    text = "alpha\n\nbeta & <gamma>"
    blob = render_docx_bytes(text)
    parts = _zip_parts(blob)
    for name in ("[Content_Types].xml", "_rels/.rels", "word/styles.xml"):
        ET.fromstring(parts[name])  # well-formed
    # generate_docx keeps blank lines as empty paragraphs
    assert _docx_paras(blob) == [
        ("alpha", None),
        ("", None),
        ("beta & <gamma>", None),
    ]


def test_docx_markdown_styles():
    md = "# Top\n## Mid\n### Deep\n* bullet\n- dash\n\nplain\n[Image of x]"
    blob, n_paras, n_heads, n_bulls = render_docx_from_markdown(md)
    assert (n_paras, n_heads, n_bulls) == (7, 3, 2)  # blank skipped
    assert _docx_paras(blob) == [
        ("Top", "Heading1"),
        ("Mid", "Heading2"),
        ("Deep", "Heading3"),
        ("bullet", "ListBullet"),
        ("dash", "ListBullet"),
        ("plain", None),
        ("[Image of x]", None),  # docx writer has no image handling
    ]


# ----------------------------------------------------------------- PPTX

def _pptx_slides(blob: bytes) -> list[tuple[str, list[tuple[int, str, bool]]]]:
    """[(title, [(lvl, text, bold)])] per slide, in presentation order."""
    parts = _zip_parts(blob)
    names = sorted(
        (n for n in parts if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
        key=lambda n: int(re.search(r"\d+", n).group()),
    )
    slides = []
    for name in names:
        root = ET.fromstring(parts[name])
        title, body = "", []
        for sp in root.iter(f"{P}sp"):
            ph = sp.find(f"{P}nvSpPr/{P}nvPr/{P}ph")
            paras = [
                (
                    int(p.find(f"{A}pPr").get("lvl", "0"))
                    if p.find(f"{A}pPr") is not None
                    else 0,
                    "".join(t.text or "" for t in p.iter(f"{A}t")),
                    any(
                        r.get("b") == "1"
                        for r in p.iter(f"{A}rPr")
                    ),
                )
                for p in sp.iter(f"{A}p")
            ]
            if ph is not None and ph.get("type") == "title":
                title = paras[0][1] if paras else ""
            else:
                body = [x for x in paras if x[1]]
        slides.append((title, body))
    return slides


def test_pptx_plain_blank_line_split():
    blob = render_pptx_bytes("Intro\npoint a\n\nSecond slide\npoint b\npoint c")
    parts = _zip_parts(blob)
    for req in (
        "ppt/presentation.xml",
        "ppt/slideMasters/slideMaster1.xml",
        "ppt/slideLayouts/slideLayout1.xml",
        "ppt/theme/theme1.xml",
    ):
        ET.fromstring(parts[req])
    assert _pptx_slides(blob) == [
        ("Intro", [(0, "point a", False)]),
        ("Second slide", [(0, "point b", False), (0, "point c", False)]),
    ]


def test_pptx_markdown_semantics():
    # NB: "\n### x" (with a space) starts a NEW slide — the reference
    # split regex (?=\n#+\s) fires on every heading level; the '###'
    # bold-body path only triggers without a following space.
    md = (
        "# First\nplain\n* b0\n** b1\n[Image of a cat]\n"
        "\n## Second\n###tight"
    )
    blob, n_slides, n_images = render_pptx_from_markdown(md)
    assert (n_slides, n_images) == (2, 1)
    slides = _pptx_slides(blob)
    assert slides[0][0] == "First" and slides[1][0] == "Second"
    assert slides[0][1] == [
        (0, "plain", False),
        (0, "b0", False),
        (1, "b1", False),
        (0, "\U0001f5bc️ [PROMPT: a cat]", True),
    ]
    assert slides[1][1] == [(0, "tight", True)]
    # a spaced "###" heading line does start its own slide
    _, n3, _ = render_pptx_from_markdown("# A\nbody\n\n### Sub here")
    assert n3 == 2


def test_pptx_styled_theme_and_chart_part():
    from pdf_to_text_ray.sinks.render import (
        PPTX_THEMES,
        render_pptx_with_style,
    )

    md = (
        "# Sales\nintro line\n"
        "[CHART: Revenue 2026, Series A, Q1:$10.5, Q2:20, Bad:n/a, skipme]\n"
        "\n## Outlook\nmore text"
    )
    blob, n_slides, n_charts, n_points = render_pptx_with_style(md, "dark")
    assert (n_slides, n_charts, n_points) == (2, 1, 3)
    parts = _zip_parts(blob)
    # chart part exists, is well-formed, and carries the parsed data
    chart = parts["ppt/charts/chart1.xml"].decode()
    root = ET.fromstring(chart)
    cns = "{http://schemas.openxmlformats.org/drawingml/2006/chart}"
    cats = [
        e.text
        for e in root.iter(f"{cns}v")
    ]
    assert "Revenue 2026" in chart and "Series A" in chart
    assert {"Q1", "Q2", "Bad"} <= set(cats)
    assert {"10.5", "20.0", "0.0"} <= set(cats)
    # slide 1 references the chart through its rels + a graphicFrame
    rels = parts["ppt/slides/_rels/slide1.xml.rels"].decode()
    assert "../charts/chart1.xml" in rels
    slide1 = parts["ppt/slides/slide1.xml"].decode()
    assert "<p:graphicFrame>" in slide1 and 'r:id="rId2"' in slide1
    # theme palette applied: background + run colors + font
    theme = PPTX_THEMES["dark"]
    assert f'<a:srgbClr val="{theme["bg"]}"/>' in slide1
    assert f'<a:srgbClr val="{theme["title"]}"/>' in slide1
    assert f'<a:latin typeface="{theme["font"]}"/>' in slide1
    # chart bars take the theme accent
    assert f'<a:srgbClr val="{theme["accent"]}"/>' in chart
    # content types declare the chart part; slide 2 has no chart
    assert "drawingml.chart+xml" in parts["[Content_Types].xml"].decode()
    assert "ppt/charts/chart2.xml" not in parts
    assert b"<p:graphicFrame>" not in parts["ppt/slides/slide2.xml"]
    # deterministic bytes
    blob2, *_ = render_pptx_with_style(md, "dark")
    assert blob == blob2
    # unparseable chart string (< 3 comma parts) drops like the
    # reference's failure path
    _, _, nc, np_ = render_pptx_with_style("# T\n[CHART: only, two]", "default")
    assert (nc, np_) == (0, 0)


def test_pptx_unstyled_bytes_unchanged_by_theme_plumbing():
    # the theme/chart extension must not perturb the un-themed render
    blob, *_ = render_pptx_from_markdown("# A\nbody\n* b")
    parts = _zip_parts(blob)
    assert b"<p:bg>" not in parts["ppt/slides/slide1.xml"]
    assert b"graphicFrame" not in parts["ppt/slides/slide1.xml"]
    assert b"chart" not in parts["[Content_Types].xml"]


# ---------------------------------------------------------- determinism

def test_renders_are_byte_deterministic():
    text = "# S\nhello world\n* b\n\npage"
    assert render_pdf_bytes(text) == render_pdf_bytes(text)
    assert render_docx_bytes(text) == render_docx_bytes(text)
    assert render_pptx_bytes(text) == render_pptx_bytes(text)
    a, *_ = render_docx_from_markdown(text)
    b, *_ = render_docx_from_markdown(text)
    assert a == b
    pa_, *_ = render_pptx_from_markdown(text)
    pb_, *_ = render_pptx_from_markdown(text)
    assert pa_ == pb_


# ------------------------------------------------------------ Ray side

def test_render_outputs_batch_counts():
    words = " ".join(f"w{i}" for i in range(200))  # 20 lines, 4 sections
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array([words], pa.string())})
    out = render_outputs_batch(batch)
    row = {c: out[c][0].as_py() for c in out.column_names}
    assert row["docx_headings"] == 4 == row["pptx_slides"]
    assert row["docx_paragraphs"] == 24  # 20 content + 4 headings
    # sections 0..3: lines j==2 and j==5 are bullets, j==4 image
    assert row["docx_bullets"] == 3 + 3  # j==2 / j==5 in sections 0..2
    assert row["pptx_image_prompts"] == 3  # j==4 absent from short tail
    assert row["pdf_pages"] == 1
    assert row["pdf"][:5] == b"%PDF-"
    assert row["docx"][:2] == b"PK" and row["pptx"][:2] == b"PK"


def test_export_all_outputs_sink(sf_dir, tmp_path):
    import ray.data

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).limit(12)
    out = str(tmp_path / "export")
    manifest = export_all_outputs(docs, out, num_partitions=4).take_all()
    assert len(manifest) == 12
    import os

    for m in manifest:
        assert m["partition"] == m["doc_id"] % 4
        for ext in ("pdf", "docx", "pptx"):
            path = os.path.join(out, f"part={m['partition']}", f"doc_{m['doc_id']}.{ext}")
            size = os.path.getsize(path)
            assert size == m[f"{ext}_bytes"] > 0
    # rerun overwrites atomically and reproduces identical bytes
    manifest2 = export_all_outputs(docs, out, num_partitions=4).take_all()
    assert sorted((m["doc_id"], m["pdf_bytes"]) for m in manifest) == sorted(
        (m["doc_id"], m["pdf_bytes"]) for m in manifest2
    )


def test_render_outputs_query_matches_oracle(sf_dir):
    import duckdb

    from pdf_to_text_ray.pipelines.queries import (
        QUERIES,
        ORACLE_SQL,
    )

    got = (
        QUERIES["render_outputs"](sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.execute(ORACLE_SQL["render_outputs"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got[want.columns], want)


def test_export_resume_skips_existing(sf_dir, tmp_path):
    """resume=True re-renders only missing/torn artifacts (mtimes of
    completed files are untouched on the resumed run)."""
    import os
    import ray.data

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).limit(6)
    out = str(tmp_path / "resume")
    export_all_outputs(docs, out, num_partitions=2).take_all()

    victim = os.path.join(out, "part=1", "doc_1.pdf")
    os.remove(victim)
    survivor = os.path.join(out, "part=0", "doc_0.pdf")
    before = os.path.getmtime(survivor)

    m = export_all_outputs(docs, out, num_partitions=2, resume=True).take_all()
    assert len(m) == 6
    assert os.path.getsize(victim) > 0           # re-rendered
    assert os.path.getmtime(survivor) == before  # untouched
    # manifest sizes match disk for both skipped and re-rendered docs
    for r in m:
        for ext in ("pdf", "docx", "pptx"):
            p = os.path.join(out, f"part={r['partition']}", f"doc_{r['doc_id']}.{ext}")
            assert os.path.getsize(p) == r[f"{ext}_bytes"]
