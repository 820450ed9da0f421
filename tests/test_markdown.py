"""Markdown structure / slide windowing / blueprint / chart-parse ops
(SURVEY.md §2 M16, M17, O3, S13) — unit pins for the reference
semantics plus end-to-end query runs."""

import json

import pyarrow as pa

from pdf_to_text_ray.stages.markdown import (
    LINES_PER_SLIDE,
    chart_parse_batch,
    make_blueprint,
    markdown_report_batch,
    parse_chart_string,
    parse_markdown,
    slide_windows_batch,
    synth_markdown,
    text_lines,
    validate_blueprint_batch,
)


# ------------------------------------------------------------- parser

def test_parse_markdown_reference_semantics():
    md = "\n".join(
        [
            "# Title",
            "plain paragraph",
            "* bullet one",
            "** nested bullet",
            "- dash bullet",
            "## Sub",
            "### Deep",
            "[Image of a cat]",
            "text with [image of DOG] inline",  # case-insensitive search
            "",  # empty lines skipped
            "last",
        ]
    )
    rows = parse_markdown(md)
    kinds = [(r[2], r[3], r[4]) for r in rows]
    assert kinds == [
        ("h1", 1, "Title"),
        ("para", 0, "plain paragraph"),
        ("bullet", 0, "bullet one"),
        ("bullet", 1, "nested bullet"),
        ("bullet", 0, "dash bullet"),
        ("h2", 2, "Sub"),
        ("h3", 3, "Deep"),
        ("image", 0, "a cat"),
        ("image", 0, "DOG"),
        ("para", 0, "last"),
    ]
    # slide assignment: slide_no = headings seen - 1
    assert [r[1] for r in rows] == [0, 0, 0, 0, 0, 1, 2, 2, 2, 2]
    # empty line 9 is skipped but line numbering is raw
    assert [r[0] for r in rows] == [0, 1, 2, 3, 4, 5, 6, 7, 8, 10]


def test_synth_markdown_shape():
    text = " ".join(f"w{i}" for i in range(100))  # 10 lines, 2 sections
    md = synth_markdown(text)
    lines = md.split("\n")
    assert lines[0] == "# Section 1"
    assert lines[3].startswith("* ")  # in-section line 2
    assert lines[5].startswith("[Image of w40]")  # line 4: first word
    assert lines[6].startswith("** ")  # line 5: level-1 bullet
    assert lines[7] == "## Section 2"  # heading level cycles


def test_parse_of_synth_roundtrip_counts():
    text = " ".join(f"word{i}" for i in range(95))  # 10 lines (last=5w)
    rows = parse_markdown(synth_markdown(text))
    kinds = [r[2] for r in rows]
    assert kinds.count("h1") == 1 and kinds.count("h2") == 1
    # section 2 has only 4 content lines (j stops at 3): one image
    assert kinds.count("image") == 1
    # content rows = 10 lines, heading rows = 2 sections
    assert len(rows) == 12


# ------------------------------------------------------------- slides

def test_slide_windows_partial_tail():
    text = " ".join(f"w{i}" for i in range(10 * (LINES_PER_SLIDE + 3)))
    batch = pa.table(
        {"doc_id": pa.array([7], pa.int64()), "text": pa.array([text])}
    )
    out = slide_windows_batch(batch)
    assert out["slide_no"].to_pylist() == [0, 1]
    assert out["n_lines"].to_pylist() == [LINES_PER_SLIDE, 3]
    assert out["title"].to_pylist() == ["Content", "Content"]
    assert out["slide_text"][0].as_py().count("\x1f") == LINES_PER_SLIDE - 1


# ------------------------------------------------------------- report

def test_markdown_report_bytes():
    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["alpha beta gamma"]),
        }
    )
    out = markdown_report_batch(batch)
    report = out["report"][0].as_py()
    assert report == "# Section 1\nalpha beta gamma"
    assert out["n_bytes"][0].as_py() == len(report.encode("utf-8"))


# ---------------------------------------------------------- blueprint

def test_blueprint_validate_and_corrupt_path():
    text = " ".join(f"w{i}" for i in range(100))
    good = make_blueprint(text, corrupt=False)
    parsed = json.loads(good)
    assert parsed[0]["title"] == "Section 1"
    assert len(parsed) == 2
    bad = make_blueprint(text, corrupt=True)
    try:
        json.loads(bad)
        raise AssertionError("corrupt blueprint must not parse")
    except json.JSONDecodeError:
        pass
    batch = pa.table(
        {
            "doc_id": pa.array([13, 14], pa.int64()),  # 13 -> corrupt
            "text": pa.array([text, text]),
        }
    )
    out = validate_blueprint_batch(batch)
    assert out["valid"].to_pylist() == [False, True]
    assert out["n_slides"].to_pylist() == [0, 2]
    assert out["n_content_lines"].to_pylist() == [0, 10]
    # pretty-print round-trips
    assert out["pretty_bytes"][1].as_py() == len(
        json.dumps(json.loads(good), indent=2).encode("utf-8")
    )


# -------------------------------------------------------------- chart

def test_chart_parse_grammar():
    # reference grammar: title, series, label:value...
    assert parse_chart_string("T, S, a:1") == ("T", "S", [("a", 1.0)])
    # currency / junk cleaning and no-colon skip
    title, series, pts = parse_chart_string(
        "Sales 2026, Rev, Q1:$1,Q2: 2.5x, bad:n/a, skipme"
    )
    assert title == "Sales 2026" and series == "Rev"
    assert pts == [("Q1", 1.0), ("Q2", 2.5), ("bad", 0.0)]
    # < 3 comma parts -> parse failure (reference raises)
    assert parse_chart_string("only, two") is None


def test_chart_parse_batch_rows():
    batch = pa.table({"doc_id": pa.array([3], pa.int64())})
    out = chart_parse_batch(batch)
    assert out["category"].to_pylist() == ["Q1", "Q2", "Bad"]
    assert out["value"].to_pylist() == [21.5, 39.0, 0.0]


# ------------------------------------------------------ query round-up

def test_markdown_queries_run(sf_dir):
    from pdf_to_text_ray.pipelines.queries import QUERIES

    assert QUERIES["markdown_structure"](sf_dir).count() > 0
    assert QUERIES["slide_windows"](sf_dir).count() > 0
    rows = QUERIES["blueprint_validate"](sf_dir).take_all()
    # the corrupt path fires exactly on doc_id % 13 == 0
    for r in rows:
        assert r["valid"] == (r["doc_id"] % 13 != 0), r
    assert any(not r["valid"] for r in rows)
    assert any(r["valid"] for r in rows)


def test_text_lines_empty():
    assert text_lines("") == []
    assert parse_markdown(synth_markdown("")) == []


def test_generate_blueprint_roundtrip_and_update():
    import json

    from pdf_to_text_ray.stages.markdown import generate_blueprint

    text = " ".join(f"w{i}" for i in range(70))  # 7 lines -> 2 sections
    bp, up, n = generate_blueprint(text)
    slides = json.loads(bp)
    assert n == len(slides) == 2
    assert slides[0]["title"] == "Section 1"
    assert len(slides[0]["content"]) == 6  # full section
    # the image line contributes its first word only
    assert slides[0]["content"][4] == "w40"
    updated = json.loads(up)
    assert updated[:-1] == slides
    assert updated[-1] == {"title": "Summary", "content": ["Sections: 2"]}
    # the generated blueprint feeds the M17 validator round-trip
    assert json.dumps(json.loads(bp)) is not None
    # empty doc -> empty structure, update still appends the summary
    bp0, up0, n0 = generate_blueprint("")
    assert (bp0, n0) == ("[]", 0)
    assert json.loads(up0) == [{"title": "Summary", "content": ["Sections: 0"]}]
