"""Markdown structure / slide-windowing / blueprint operators — the
*structured* half of the reference's output-generation surface
(SURVEY.md §2 M16, M17, O3, S13). The PDF/DOCX/PPTX byte renderers
live in ``sinks/render.py`` (pure-stdlib, no reportlab/python-docx/
python-pptx needed); everything the reference computes BEFORE the
container bytes is implemented here as ``map_batches`` bodies with
SQL oracles.

Reference semantics reproduced (file:line):

* line classification — ``core_document_processing.py:381-401``
  (``create_docx_from_markdown``: '###'→h3, '##'→h2, '#'→h1,
  '*'/'-'/'•'→bullet, else paragraph) combined with the PPTX parser's
  image-tag precedence and two-level bullets
  (``core_document_processing.py:341-372``: ``\\[Image of (.+?)\\]``
  checked FIRST, ``^[\\*•-]\\s``→level-0 bullet,
  indent/``^[\\*•-]{2,}``→level-1 bullet).
* slide split on headings — ``core_document_processing.py:309-312``
  (``re.split(r'(?=\\n#+\\s)')``): slide_no below = running count of
  heading lines.
* fixed 12-line slide windowing — ``gemini_processing.py:95-108``
  (``max_lines_per_slide = 12``, trailing partial window kept, every
  slide titled "Content").
* markdown report string — ``core_document_processing.py:409-415``
  (the assembled markdown utf-8 encoded; here: the string + byte len).
* blueprint JSON validate + pretty-print — ``ui.py:180-187``
  (``json.loads`` then ``json.dumps(indent=2)``; invalid JSON keeps
  raw text and flags the error).
* chart-string parse — ``pptx_designer.py:131-153``
  ("<title>, <series>, <cat>:<val>, ...": ≥3 comma parts required,
  value cleaned with ``re.sub(r'[^\\d.]', '')`` then float, 0.0 on
  failure, no-colon parts skipped).

The synthetic markdown is a pure arithmetic function of the document
words (10-word lines, 6-line sections, heading level cycling 1→2→3,
bullet at in-section lines 2 and 5 — level 1 at 5, image tag at 4), so
the DuckDB oracles reconstruct the expected parse from the same
arithmetic — the extract_e2e construction-oracle pattern.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

_RE_TOKEN = re.compile(r"\S+")
_RE_IMAGE = re.compile(r"\[Image of (.+?)\]", re.IGNORECASE)
_RE_BULLET0 = re.compile(r"^[\*•-]\s")
_RE_BULLET1 = re.compile(r"^[\*•-]{2,}")

WORDS_PER_LINE = 10
LINES_PER_SECTION = 6
LINES_PER_SLIDE = 12  # gemini_processing.py:98


# ------------------------------------------------- markdown synthesis

def text_lines(text: str) -> list[str]:
    """Plain 10-word lines (the 'clean text' line form O3 windows)."""
    toks = _RE_TOKEN.findall(text)
    return [
        " ".join(toks[i : i + WORDS_PER_LINE])
        for i in range(0, len(toks), WORDS_PER_LINE)
    ]


def synth_markdown(text: str) -> str:
    """Deterministic markdown rendering of a document: sections of 6
    content lines, heading level cycling #/##/###, bullets at
    in-section lines 2 (level 0) and 5 (level 1), an [Image of ...]
    tag at line 4."""
    lines = text_lines(text)
    out: list[str] = []
    for c, line in enumerate(lines):
        s, j = divmod(c, LINES_PER_SECTION)
        if j == 0:
            out.append("#" * (s % 3 + 1) + f" Section {s + 1}")
        if j == 4:
            first = line.split(" ", 1)[0]
            out.append(f"[Image of {first}]")
        elif j == 2:
            out.append("* " + line)
        elif j == 5:
            out.append("** " + line)
        else:
            out.append(line)
    return "\n".join(out)


# --------------------------------------------------- structure parser

def parse_markdown(md: str) -> list[tuple[int, int, str, int, str]]:
    """-> [(line_no, slide_no, kind, level, content)] per non-empty
    line. kind ∈ h1|h2|h3|image|bullet|para; level: heading depth, or
    bullet nesting (0/1), else 0. slide_no = headings seen so far - 1
    (clamped at 0 for content before any heading), matching the
    ``(?=\\n#+\\s)`` slide split."""
    rows: list[tuple[int, int, str, int, str]] = []
    n_headings = 0
    for line_no, raw in enumerate(md.split("\n")):
        line = raw.strip()
        if not line:
            continue
        img = _RE_IMAGE.search(line)
        if img:
            kind, level, content = "image", 0, img.group(1).strip()
        elif line.startswith("###"):
            kind, level, content = "h3", 3, line.lstrip("#").strip()
        elif line.startswith("##"):
            kind, level, content = "h2", 2, line.lstrip("#").strip()
        elif line.startswith("#"):
            kind, level, content = "h1", 1, line.lstrip("#").strip()
        elif _RE_BULLET1.match(line):
            kind, level = "bullet", 1
            content = line.lstrip("*•- \t").strip()
        elif _RE_BULLET0.match(line):
            kind, level = "bullet", 0
            content = _RE_BULLET0.sub("", line).strip()
        else:
            kind, level, content = "para", 0, line
        if kind in ("h1", "h2", "h3"):
            n_headings += 1
        rows.append((line_no, max(0, n_headings - 1), kind, level, content))
    return rows


def markdown_structure_batch(batch: pa.Table) -> pa.Table:
    doc_ids, line_nos, slide_nos, kinds, levels, contents = (
        [], [], [], [], [], [],
    )
    for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        for line_no, slide_no, kind, level, content in parse_markdown(
            synth_markdown(text)
        ):
            doc_ids.append(did)
            line_nos.append(line_no)
            slide_nos.append(slide_no)
            kinds.append(kind)
            levels.append(level)
            contents.append(content)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "line_no": pa.array(line_nos, pa.int64()),
            "slide_no": pa.array(slide_nos, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "level": pa.array(levels, pa.int64()),
            "content": pa.array(contents, pa.string()),
        }
    )


# -------------------------------------------------- slide windowing O3

def slide_windows_batch(batch: pa.Table, us: str = "\x1f") -> pa.Table:
    """Fixed 12-line windows over the document's plain lines; trailing
    partial slide kept; constant title "Content"
    (gemini_processing.py:100-108). Lines joined by ``us`` so the
    output schema stays flat."""
    doc_ids, slide_nos, titles, n_lines, texts = [], [], [], [], []
    for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        lines = text_lines(text)
        for slide_no in range(0, (len(lines) + LINES_PER_SLIDE - 1) // LINES_PER_SLIDE):
            window = lines[
                slide_no * LINES_PER_SLIDE : (slide_no + 1) * LINES_PER_SLIDE
            ]
            doc_ids.append(did)
            slide_nos.append(slide_no)
            titles.append("Content")
            n_lines.append(len(window))
            texts.append(us.join(window))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "slide_no": pa.array(slide_nos, pa.int64()),
            "title": pa.array(titles, pa.string()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "slide_text": pa.array(texts, pa.string()),
        }
    )


# ------------------------------------------------ markdown report S13

def markdown_report_batch(batch: pa.Table) -> pa.Table:
    """The assembled markdown report per document (S13 — the reference
    utf-8 encodes exactly this string into the download stream)."""
    reports = [synth_markdown(t) for t in batch["text"].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "report": pa.array(reports, pa.string()),
            "n_bytes": pa.array(
                [len(r.encode("utf-8")) for r in reports], pa.int64()
            ),
        }
    )


# ------------------------------------------- blueprint validate (M17)

def make_blueprint(text: str, corrupt: bool) -> str:
    """Slide blueprint JSON from the synthesized markdown structure:
    [{"title": ..., "content": [...]}] per slide. ``corrupt`` drops the
    closing bracket to exercise the invalid path."""
    slides: dict[int, dict] = {}
    for _, slide_no, kind, _, content in parse_markdown(synth_markdown(text)):
        if kind in ("h1", "h2", "h3"):
            slides.setdefault(slide_no, {"title": content, "content": []})
        else:
            slides.setdefault(slide_no, {"title": "", "content": []})[
                "content"
            ].append(content)
    blob = json.dumps([slides[k] for k in sorted(slides)])
    return blob[:-1] if corrupt else blob


def validate_blueprint_batch(batch: pa.Table) -> pa.Table:
    """ui.py:180-187: parse, pretty-print, flag invalid. Emits counts
    (n_slides, n_content_lines) from the PARSED structure so the check
    exercises the round-trip, plus the pretty-printed byte length."""
    doc_ids, valids, n_slides, n_lines, pretty_bytes = [], [], [], [], []
    for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        raw = make_blueprint(text, corrupt=(did % 13 == 0))
        try:
            parsed = json.loads(raw)
            pretty = json.dumps(parsed, indent=2)
            valids.append(True)
            n_slides.append(len(parsed))
            n_lines.append(sum(len(s["content"]) for s in parsed))
            pretty_bytes.append(len(pretty.encode("utf-8")))
        except json.JSONDecodeError:
            valids.append(False)
            n_slides.append(0)
            n_lines.append(0)
            pretty_bytes.append(0)
        doc_ids.append(did)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "valid": pa.array(valids, pa.bool_()),
            "n_slides": pa.array(n_slides, pa.int64()),
            "n_content_lines": pa.array(n_lines, pa.int64()),
            "pretty_bytes": pa.array(pretty_bytes, pa.int64()),
        }
    )


# --------------------------------- blueprint generation + update stand-in

def generate_blueprint(text: str) -> tuple[str, str, int]:
    """Deterministic stand-in for the reference's LLM blueprint
    generation and update (core_document_generator.py:264-321
    ``generate_initial_structure``, :323-366 ``update_structure`` —
    quarantined LLM calls per SURVEY §7.7, closed the same way M11
    was): the parsed markdown structure becomes the initial
    ``[{"title", "content": [...]}]`` blueprint, and the update applies
    a fixed instruction ("append a summary slide") to the structure.

    -> (blueprint_json, updated_json, n_slides). ensure_ascii=False so
    non-ASCII stays raw UTF-8 and the SQL oracle can rebuild the exact
    string (no \\uXXXX escapes)."""
    slides: list[dict] = []
    for _, slide_no, kind, _, content in parse_markdown(synth_markdown(text)):
        if kind in ("h1", "h2", "h3"):
            slides.append({"title": content, "content": []})
        elif slides:
            slides[-1]["content"].append(content)
    blueprint = json.dumps(slides, ensure_ascii=False)
    updated = json.dumps(
        slides + [{"title": "Summary", "content": [f"Sections: {len(slides)}"]}],
        ensure_ascii=False,
    )
    return blueprint, updated, len(slides)


def generate_blueprint_batch(batch: pa.Table) -> pa.Table:
    doc_ids, bps, ups, ns, nb = [], [], [], [], []
    for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        bp, up, n = generate_blueprint(text)
        doc_ids.append(did)
        bps.append(bp)
        ups.append(up)
        ns.append(n)
        nb.append(len(bp.encode("utf-8")))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "blueprint": pa.array(bps, pa.string()),
            "blueprint_updated": pa.array(ups, pa.string()),
            "n_slides": pa.array(ns, pa.int64()),
            "n_bytes": pa.array(nb, pa.int64()),
        }
    )


# --------------------------------------------- chart-string parse M16

_RE_CHART_CLEAN = re.compile(r"[^\d.]")


def parse_chart_string(s: str) -> tuple[str, str, list[tuple[str, float]]] | None:
    """pptx_designer.py:131-153 chart grammar. None when < 3 comma
    parts (the reference raises and reports failure)."""
    parts = s.split(",")
    if len(parts) < 3:
        return None
    title = parts[0].strip()
    series = parts[1].strip()
    points: list[tuple[str, float]] = []
    for part in parts[2:]:
        if ":" in part:
            label, value = part.split(":", 1)
            try:
                points.append(
                    (label.strip(), float(_RE_CHART_CLEAN.sub("", value)))
                )
            except ValueError:
                points.append((label.strip(), 0.0))
    return title, series, points


def synth_chart_string(doc_id: int) -> str:
    """Deterministic chart string, exercising currency symbols, junk
    values (-> 0.0) and a no-colon part (skipped)."""
    v1 = (doc_id * 7) % 1000
    v2 = (doc_id * 13) % 500
    return (
        f"Revenue {doc_id}, Series A, Q1:${v1}.5, Q2:{v2}, Bad:n/a, skipme"
    )


def chart_parse_batch(batch: pa.Table) -> pa.Table:
    """One row per parsed data point: (doc_id, chart_title,
    series_name, category, value)."""
    doc_ids, titles, series, cats, vals = [], [], [], [], []
    for did in batch["doc_id"].to_pylist():
        parsed = parse_chart_string(synth_chart_string(did))
        if parsed is None:
            continue
        title, sname, points = parsed
        for cat, val in points:
            doc_ids.append(did)
            titles.append(title)
            series.append(sname)
            cats.append(cat)
            vals.append(val)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "chart_title": pa.array(titles, pa.string()),
            "series_name": pa.array(series, pa.string()),
            "category": pa.array(cats, pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )
