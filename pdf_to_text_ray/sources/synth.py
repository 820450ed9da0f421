"""Deterministic Common-Crawl-style corpus synthesizer.

Builds the authoritative input table (BASELINE.json ``input_hint``:
``url, warc_ts, html(binary), text, lang``) from the driver-provided
``documents.parquet`` — every payload is a pure function of
``(doc_id, documents.text)``, so the expected extraction result is
expressible in ANSI SQL over the same table (the DuckDB oracle) and
reproducible at any scale factor. No wall clock, no RNG.

Payload class by ``doc_id % 10`` (FIXTURES.md F1):

  0,1,2  html_simple     — semantic HTML, nav/footer boilerplate
  3,4    html_boiler     — div soup, link-dense sidebars, script blocks
  5      html_malformed  — unclosed tags, unquoted attrs
  6      pdf_raw         — dual-layer PDF, raw content streams
  7      pdf_flate       — dual-layer PDF, FlateDecode streams
  8      pdf_imageonly   — image-only PDF (forces the OCR route)
  9      junk            — unsniffable bytes (doc_type=unknown)

Class 2 additionally emits a STALE re-crawl row (same url, warc_ts one
day earlier, payload built from a corrupted text) so exact dedup
keep-latest is exercised end-to-end.

Runs as a ``map_batches`` stage so synthesis itself is distributed.
"""

from __future__ import annotations

import hashlib
import html as html_mod
from datetime import datetime, timedelta

import pyarrow as pa

from ..pdfgen import build_pdf, paginate

WORDS_PER_PAGE = 60
EPOCH = datetime(2026, 1, 1)

_SIDEBAR_LINKS = "".join(
    f'<a href="/cat/{i}">category {i} archive</a> ' for i in range(8)
)
_NAV = (
    '<nav><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact</a> <a href="/archive">Archive</a></nav>'
)
_FOOTER = (
    "<footer>&copy; 2026 example.com <a href=\"/privacy\">Privacy</a> "
    "<a href=\"/terms\">Terms</a></footer>"
)
_SCRIPT = "<script>var q=[];for(var i=0;i<9;i++){q.push(i*i);}console.log(q);</script>"
_STYLE = "<style>body{margin:0;font:14px sans-serif}.sidebar{float:left}</style>"


def make_html_simple(doc_id: int, text: str) -> bytes:
    esc = html_mod.escape(text)
    return (
        f"<!DOCTYPE html><html><head><title>Document {doc_id}</title>{_STYLE}"
        f"{_SCRIPT}</head><body><header>{_NAV}</header>"
        f"<main><article><p>{esc}</p></article></main>"
        f"<aside>{_SIDEBAR_LINKS}</aside>{_FOOTER}</body></html>"
    ).encode("utf-8")


def make_html_boiler(doc_id: int, text: str) -> bytes:
    esc = html_mod.escape(text)
    return (
        f'<html><head><title>Doc {doc_id}</title>{_SCRIPT}{_STYLE}</head><body>'
        f'<div id="page"><div class="topbar">{_SIDEBAR_LINKS}</div>'
        f'<div class="wrap"><div class="sidebar"><div class="widget">{_SIDEBAR_LINKS}</div>'
        f'<div class="widget2">{_SIDEBAR_LINKS}</div></div>'
        f'<div class="content"><p>{esc}</p></div>'
        f'<div class="comments"><div class="c">nice post</div><div class="c">+1</div></div>'
        f"</div></div>{_SCRIPT}</body></html>"
    ).encode("utf-8")


def make_html_malformed(doc_id: int, text: str) -> bytes:
    esc = html_mod.escape(text)
    # unclosed <p> and <div>, unquoted attributes, stray close tags
    return (
        f"<html><body><div class=main><p>{esc}\n"
        f"<div class=foot>{_SIDEBAR_LINKS}</span></body>"
    ).encode("utf-8")


def make_pdf_payload(doc_id: int, text: str, cls: int) -> bytes:
    pages = paginate(text, WORDS_PER_PAGE)
    if cls == 6:
        return build_pdf(pages, text_layer=True, image_layer=True, flate=False)
    if cls == 7:
        return build_pdf(pages, text_layer=True, image_layer=True, flate=True)
    return build_pdf(pages, text_layer=False, image_layer=True)


def make_junk(doc_id: int) -> bytes:
    h = hashlib.sha256(b"junk-%d" % doc_id).digest()
    return h * 8  # 256 deterministic bytes, neither HTML nor PDF


def url_for(doc_id: int) -> str:
    return f"https://site-{doc_id % 20}.example/doc/{doc_id}"


def ts_for(doc_id: int) -> datetime:
    return EPOCH + timedelta(seconds=int(doc_id))


def payload_for(doc_id: int, text: str) -> bytes:
    cls = doc_id % 10
    if cls in (0, 1, 2):
        return make_html_simple(doc_id, text)
    if cls in (3, 4):
        return make_html_boiler(doc_id, text)
    if cls == 5:
        return make_html_malformed(doc_id, text)
    if cls in (6, 7, 8):
        return make_pdf_payload(doc_id, text, cls)
    return make_junk(doc_id)


# Virtual-id stride for bench amplification: doc_id + r*stride keeps
# the payload class (doc_id % 10) and produces a distinct url per copy.
VIRT_STRIDE = 100_000_000


def _ts_us(dt: datetime) -> int:
    return int((dt - datetime(1970, 1, 1)).total_seconds() * 1_000_000)


def synthesize_keys_batch(batch: pa.Table, repeat: int = 1) -> pa.Table:
    """(url, ts_us) crawl keys only — the pruned-column pre-pass for
    broadcast dedup. On a real corpus this is
    ``read_parquet(columns=["url", "warc_ts"])``; here the keys are a
    pure function of doc_id so the payloads are never built."""
    urls: list[str] = []
    tss: list[int] = []
    for doc_id in batch["doc_id"].to_pylist():
        for r in range(repeat):
            vid = doc_id + r * VIRT_STRIDE
            urls.append(url_for(vid))
            tss.append(_ts_us(ts_for(vid)))
            if vid % 10 == 2:
                urls.append(url_for(vid))
                tss.append(_ts_us(ts_for(vid) - timedelta(days=1)))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "ts_us": pa.array(tss, pa.int64()),
        }
    )


def synthesize_batch(batch: pa.Table, repeat: int = 1) -> pa.Table:
    """documents rows -> docs rows (plus stale-dup rows for cls==2)."""
    urls: list[str] = []
    tss: list[datetime] = []
    payloads: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    src = [
        (doc_id + r * VIRT_STRIDE, text, lang)
        for doc_id, text, lang in zip(
            batch["doc_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["lang"].to_pylist(),
        )
        for r in range(repeat)
    ]
    for doc_id, text, lang in src:
        urls.append(url_for(doc_id))
        tss.append(ts_for(doc_id))
        payloads.append(payload_for(doc_id, text))
        texts.append("")  # crawl text withheld: extraction is required
        langs.append(lang)
        if doc_id % 10 == 2:
            # stale re-crawl: same url, earlier ts, corrupted content —
            # dedup keep-latest must drop it
            urls.append(url_for(doc_id))
            tss.append(ts_for(doc_id) - timedelta(days=1))
            payloads.append(make_html_simple(doc_id, "stale draft of " + text))
            texts.append("")
            langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
