"""OCR stage: a stateful actor pool with a pluggable engine.

The engine object is built ONCE per actor in ``__init__`` (the Ray
analogue of the reference pinning its OCR client as a module singleton
— ST1/ST5 in SURVEY.md §2.3) and applied per batch in ``__call__``.
Used as::

    pages.map_batches(OcrEngine, fn_constructor_kwargs={"engine": "stub"},
                      concurrency=cfg.ocr_concurrency,
                      batch_size=cfg.ocr_batch_size, batch_format="pyarrow")

Engines:

* ``stub`` (default, sandbox): deterministic — decodes the fixture's
  embedded ``OCRSTUB1`` raster payload. Real OCR libraries are not in
  this container; the reference itself stubs an unavailable engine to
  a deterministic result (core_document_processing.py:136-143), so
  "engine unavailable → deterministic fallback" is faithful behavior.
  A real deployment plugs a Tesseract/vision engine in here; the Ray
  plumbing (actor pool, batch size, retry surface) is identical.

Post-OCR text always passes the Tesseract whitelist clean
(ocr_engine.py:30-33) — the regex whose fingerprint is visible in the
reference's committed goldens.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

from ..functions.scalar import ocr_whitelist_clean
from ..pdfgen import OCR_MAGIC


class StubOcr:
    """Deterministic OCR stand-in: reads the fixture raster format."""

    def recognize(self, payload: bytes | None) -> str:
        if not payload:
            return ""  # blank page -> empty string (reference empty goldens:
            # 3_Extracted_Texts/Synopsis/page_1.txt is 0 bytes)
        if not payload.startswith(OCR_MAGIC):
            try:
                payload = zlib.decompress(payload)
            except zlib.error:
                return ""
        if payload.startswith(OCR_MAGIC):
            try:
                return payload[len(OCR_MAGIC):].decode("utf-8")
            except UnicodeDecodeError:
                return ""
        return ""


class RealOcrUnavailable:
    """Placeholder for a real engine (Tesseract / vision model)."""

    def recognize(self, payload: bytes | None) -> str:
        raise NotImplementedError(
            "Real OCR engines (tesseract/vision) are not available in this "
            "environment; plug one in via OcrEngine(engine=...)"
        )


_ENGINES = {"stub": StubOcr, "real": RealOcrUnavailable}


class OcrEngine:
    def __init__(self, engine: str = "stub"):
        self._engine = _ENGINES[engine]()  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        routes = batch["route"].to_pylist()
        texts = batch["page_text"].to_pylist()
        if "ocr" in routes:
            payloads = batch["ocr_payload"].to_pylist()
            rec = self._engine.recognize
            texts = [
                ocr_whitelist_clean(rec(payloads[i])) if routes[i] == "ocr" else t
                for i, t in enumerate(texts)
            ]
        out = batch.drop_columns(["ocr_payload"])  # shrink the shuffle
        idx = out.schema.get_field_index("page_text")
        return out.set_column(idx, "page_text", pa.array(texts, pa.string()))


_CACHED: dict[str, OcrEngine] = {}


def ocr_task_fn(batch: pa.Table, engine: str = "stub") -> pa.Table:
    """Task-pool variant of the OCR stage: engine cached once per WORKER
    PROCESS (the task-pool analogue of actor ``__init__``). Used when the
    engine is cheap to build — an elastic task pool has no actor-spawn
    ramp, so the stage scales with the cluster instantly. Heavy engines
    (real OCR/vision models) should use the OcrEngine actor-pool form.
    """
    eng = _CACHED.get(engine)
    if eng is None:
        eng = _CACHED[engine] = OcrEngine(engine=engine)
    return eng(batch)
