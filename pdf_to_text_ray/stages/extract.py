"""Extraction dispatcher: one ``map_batches`` stage that routes each
document by ``doc_type`` and explodes PDFs into page rows.

Mirrors the reference's per-document router loop
(core_document_processing.py:32-89) with web-scale semantics:
HTML → DOM main-content strip (route ``dom``, single page);
PDF → layout parse + per-page 250-char router (routes ``text_layer`` /
``ocr``); unknown/unparseable → carrier row with ``parse_ok=False``
(the reference's log-and-continue, main.py:77-78 — one poison document
never fails a batch or the pipeline).

OCR-routed pages leave this stage with ``page_text=None`` and the page
raster in ``ocr_payload``; the downstream OCR actor pool fills them in.
Keeping routing and OCR in separate stages (instead of branching the
Dataset) avoids re-executing the upstream pipeline per branch while
still giving the OCR engine its own actor pool and batch size.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from .html_extract import extract_main_content
from .pdf_extract import PdfParseError, parse_pdf

_CARRY = ("url", "warc_ts", "lang", "doc_type", "partition_id")


def make_extractor(cfg: PipelineConfig):
    threshold = cfg.text_layer_threshold

    def extract_batch(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in _CARRY}
        page_no: list[int] = []
        page_text: list[str | None] = []
        route: list[str] = []
        ocr_payload: list[bytes | None] = []
        parse_ok: list[bool] = []
        error: list[str | None] = []

        carry_vals = {k: batch[k].to_pylist() for k in _CARRY}
        payloads = batch["html"].to_pylist()

        def emit(i: int, pno: int, text, rt: str, ocr, ok: bool, err):
            for k in _CARRY:
                cols[k].append(carry_vals[k][i])
            page_no.append(pno)
            page_text.append(text)
            route.append(rt)
            ocr_payload.append(ocr)
            parse_ok.append(ok)
            error.append(err)

        for i, payload in enumerate(payloads):
            dt = carry_vals["doc_type"][i]
            if dt == "html":
                text, ok = extract_main_content(payload)
                emit(i, 1, text, "dom", None, ok,
                     None if ok else "no content blocks")
            elif dt == "pdf":
                try:
                    for rec in parse_pdf(payload, threshold):
                        emit(i, rec["page_no"], rec["page_text"], rec["route"],
                             rec["ocr_payload"], True, None)
                except (PdfParseError, Exception) as e:  # never poison the batch
                    emit(i, 1, "", "none", None, False,
                         f"{type(e).__name__}: {e}")
            else:
                emit(i, 1, "", "none", None, False, "unsniffable payload")

        return pa.table(
            {
                "url": pa.array(cols["url"], pa.string()),
                "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
                "lang": pa.array(cols["lang"], pa.string()),
                "doc_type": pa.array(cols["doc_type"], pa.string()),
                "partition_id": pa.array(cols["partition_id"], pa.int32()),
                "page_no": pa.array(page_no, pa.int32()),
                "page_text": pa.array(page_text, pa.string()),
                "route": pa.array(route, pa.string()),
                "ocr_payload": pa.array(ocr_payload, pa.binary()),
                "parse_ok": pa.array(parse_ok, pa.bool_()),
                "error": pa.array(error, pa.string()),
            }
        )

    return extract_batch


def make_doc_extractor(cfg: PipelineConfig, engine: str = "stub"):
    """Fused doc-level stage: parse + OCR + page-combine inside ONE
    ``map_batches`` call, emitting one row per document crawl.

    Because a document's pages are exploded and reassembled within the
    same batch, no page row ever crosses a task boundary — the combine
    needs NO shuffle. Pair with the broadcast stale-crawl filter
    (pipelines/extract.py) for a fully map-only extraction path; the
    ``groupby(partition_id)`` path remains for corpora whose duplicate
    keys don't fit a broadcast (config.dedup_mode="shuffle").
    """
    from .combine import make_finalizer_arrow
    from .ocr import ocr_task_fn

    extract = make_extractor(cfg)
    finalize = make_finalizer_arrow(cfg.page_separator, cfg.combine_order)

    def doc_extract_batch(batch: pa.Table) -> pa.Table:
        # Arrow end to end: parse → OCR → combine without a pandas
        # round-trip (the pandas finalizer remains the map_groups
        # shuffle-path combine; equivalence is pytest-pinned).
        return finalize(ocr_task_fn(extract(batch), engine=engine))

    return doc_extract_batch
