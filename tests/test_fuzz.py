"""Property-based hardening: the parsers NEVER raise on arbitrary
bytes — they classify, extract, or report parse_ok=False (the
reference's log-and-continue contract, main.py:77-78). Runs with
hypothesis' deterministic profile (derandomize) so CI is stable."""

import hypothesis
import hypothesis.strategies as st
import pyarrow as pa

from pdf_to_text_ray.config import DEFAULT_CONFIG
from pdf_to_text_ray.pdfgen import build_pdf
from pdf_to_text_ray.stages.extract import make_extractor
from pdf_to_text_ray.stages.html_extract import extract_main_content
from pdf_to_text_ray.stages.pdf_extract import PdfParseError, parse_pdf
from pdf_to_text_ray.stages.sniff import sniff_payload

SETTINGS = hypothesis.settings(
    max_examples=150, derandomize=True, deadline=None
)


@hypothesis.given(st.binary(max_size=2048))
@SETTINGS
def test_sniffer_total_on_arbitrary_bytes(payload):
    assert sniff_payload(payload) in ("html", "pdf", "unknown")


@hypothesis.given(st.binary(max_size=4096))
@SETTINGS
def test_html_extractor_never_raises(payload):
    text, ok = extract_main_content(payload)
    assert isinstance(text, str) and isinstance(ok, bool)


@hypothesis.given(st.text(max_size=2048))
@SETTINGS
def test_html_extractor_on_tag_soup(s):
    text, ok = extract_main_content(("<div>" + s).encode("utf-8", "replace"))
    assert isinstance(text, str)


@hypothesis.given(st.binary(min_size=1, max_size=4096))
@SETTINGS
def test_pdf_parser_raises_only_pdfparseerror(payload):
    try:
        recs = parse_pdf(b"%PDF-1.4\n" + payload)
    except PdfParseError:
        return
    for r in recs:
        assert r["route"] in ("text_layer", "ocr")


@hypothesis.given(st.integers(min_value=0, max_value=2000))
@SETTINGS
def test_truncated_real_pdf_never_crashes_extractor(cut):
    """A valid generated PDF truncated at any offset flows through the
    extract stage as parse_ok rows or an error carrier — never an
    exception."""
    pdf = build_pdf(["hello world " * 30], text_layer=True, image_layer=True)
    payload = pdf[: min(cut, len(pdf))]
    batch = pa.table(
        {
            "url": pa.array(["https://x.example/1"]),
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "lang": pa.array(["en"]),
            "doc_type": pa.array(["pdf"]),
            "partition_id": pa.array([0], pa.int32()),
            "html": pa.array([payload], pa.binary()),
        }
    )
    out = make_extractor(DEFAULT_CONFIG)(batch)
    assert out.num_rows >= 1
    assert set(out["route"].to_pylist()) <= {"text_layer", "ocr", "none"}


# ------------------------------------------------- renderer hardening

@hypothesis.given(st.text(max_size=600))
@SETTINGS
def test_renderers_total_on_arbitrary_text(text):
    """The PDF/DOCX/PPTX writers are total: any unicode input yields a
    structurally valid container (xref offsets resolve, zip + XML
    parse), deterministically."""
    import io
    import re
    import xml.etree.ElementTree as ET
    import zipfile

    from pdf_to_text_ray.sinks.render import (
        render_docx_bytes,
        render_docx_from_markdown,
        render_pdf_bytes,
        render_pptx_bytes,
        render_pptx_from_markdown,
    )

    pdf = render_pdf_bytes(text)
    assert pdf.startswith(b"%PDF-1.4") and pdf.rstrip().endswith(b"%%EOF")
    xref = re.search(rb"xref\n0 (\d+)\n", pdf)
    nobjs = int(xref.group(1)) - 1
    for n, row in enumerate(
        pdf[xref.end():].split(b"\n")[1 : nobjs + 1], start=1
    ):
        assert pdf[int(row.split(b" ")[0]):].startswith(f"{n} 0 obj".encode())

    for blob in (
        render_docx_bytes(text),
        render_docx_from_markdown(text)[0],
        render_pptx_bytes(text),
        render_pptx_from_markdown(text)[0],
    ):
        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            assert z.testzip() is None
            for name in z.namelist():
                if name.endswith(".xml") or name.endswith(".rels"):
                    ET.fromstring(z.read(name))

    assert render_pdf_bytes(text) == pdf


@hypothesis.given(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), max_codepoint=0x2FF
        ),
        max_size=80,
    )
)
@hypothesis.settings(max_examples=300, deadline=None)
def test_canonicalize_url_never_crashes_and_is_idempotent(s):
    """Canonicalization must accept arbitrary URL-ish garbage (a web
    corpus WILL contain it) without raising, and be a projection:
    canon(canon(x)) == canon(x)."""
    from pdf_to_text_ray.functions.urlnorm import canonicalize_url

    for candidate in (s, "https://" + s, "http://host/" + s):
        out = canonicalize_url(candidate)
        assert isinstance(out, str)
        assert canonicalize_url(out) == out


# -------------------------------------------- text-op totality (new ops)

@hypothesis.given(st.text(max_size=400))
@SETTINGS
def test_gopher_quality_total_on_arbitrary_text(text):
    """gopher_quality_batch is total: any unicode doc yields one row
    with ratios in [0, 1] and finite mean word length."""
    import math

    import pyarrow as pa

    from pdf_to_text_ray.stages.textstats import gopher_quality_batch

    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([text], pa.string())})
    out = gopher_quality_batch(t).to_pylist()[0]
    for col in ("symbol_ratio", "bullet_frac", "ellipsis_frac",
                "alpha_word_frac"):
        assert 0.0 <= out[col] or out[col] >= 0.0  # no NaN
        assert math.isfinite(out[col])
    assert math.isfinite(out["mean_word_len"])
    assert out["bullet_frac"] <= 1.0 and out["ellipsis_frac"] <= 1.0


@hypothesis.given(st.lists(st.text(max_size=120), min_size=1, max_size=5))
@hypothesis.settings(max_examples=20, derandomize=True, deadline=None)
def test_tfidf_and_unigram_total(texts):
    """idf_table / unigram model builders + scorers are total over
    arbitrary docs (incl. empty / no-word docs) and every doc scores."""
    import pyarrow as pa
    import ray
    import ray.data

    from pdf_to_text_ray.stages.textstats import (
        idf_table,
        make_tfidf_scorer,
        make_unigram_scorer,
        unigram_model,
    )

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t)
    idf = idf_table(ds, len(texts))
    model = unigram_model(ds)
    tf_out = ds.map_batches(
        make_tfidf_scorer(ray.put(idf)), batch_format="pyarrow"
    ).to_pandas()
    un_out = ds.map_batches(
        make_unigram_scorer(ray.put(model)), batch_format="pyarrow"
    ).to_pandas()
    assert len(un_out) == len(texts)
    assert (tf_out["rank"] <= 3).all() if len(tf_out) else True


@hypothesis.given(st.binary(max_size=600))
@hypothesis.settings(max_examples=120, derandomize=True, deadline=None)
def test_warc_parse_total_over_arbitrary_bytes(data):
    """_parse_bytes never crashes and always terminates on arbitrary
    bytes — including gzip-magic prefixes, stray WARC/ markers and
    hostile Content-Length values."""
    from pdf_to_text_ray.sources.warc import _parse_bytes

    out = _parse_bytes(data)
    assert out.num_rows >= 0


@hypothesis.given(st.binary(max_size=200))
@hypothesis.settings(max_examples=60, derandomize=True, deadline=None)
def test_warc_parse_total_with_injected_markers(payload):
    """Records whose PAYLOAD contains record markers / header
    separators still parse exactly (length-delimited framing)."""
    from pdf_to_text_ray.sources.warc import _parse_bytes, warc_record_bytes

    evil = b"WARC/1.0\r\nContent-Length: 3\r\n\r\n" + payload
    rec = warc_record_bytes("https://f/1", 11, evil, "en")
    out = _parse_bytes(rec)
    assert out.num_rows >= 1
    assert out["html"].to_pylist()[0] == evil
