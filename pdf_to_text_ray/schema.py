"""Arrow schemas for every engine table.

The input shape is the authoritative one from BASELINE.json
``input_hint``: a Common-Crawl-style web-page table. Intermediate
tables follow SURVEY.md §1.2.
"""

from __future__ import annotations

import pyarrow as pa

# Input table (Common-Crawl-style web pages).
DOCS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),  # raw payload: HTML bytes, %PDF- bytes, or junk
        ("text", pa.string()),  # crawl-provided plain text ("" -> extraction required)
        ("lang", pa.string()),
    ]
)

# After the byte-sniffer (adds routing metadata; payload carried through).
ROUTE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("lang", pa.string()),
        ("doc_type", pa.string()),  # html | pdf | unknown
        ("n_bytes", pa.int64()),
        ("size_class", pa.string()),  # s | m | l | xl
        ("partition_id", pa.int32()),  # hash(url) % P — stable checkpoint key
    ]
)

# After extraction: one row per page (HTML docs are a single "page").
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("doc_type", pa.string()),
        ("partition_id", pa.int32()),
        ("page_no", pa.int32()),
        ("page_text", pa.string()),  # null when routed to OCR and not yet OCR'd
        ("route", pa.string()),  # dom | text_layer | ocr | none
        ("ocr_payload", pa.binary()),  # page raster for the OCR stage (null otherwise)
        ("parse_ok", pa.bool_()),
        ("error", pa.string()),
    ]
)

# After dedup + per-url combine.
EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("text", pa.string()),
        ("doc_type", pa.string()),
        ("lang", pa.string()),
        ("n_pages", pa.int32()),
        ("n_chars", pa.int64()),
        ("routes", pa.list_(pa.string())),
        ("parse_failures", pa.int32()),
        ("parse_ok", pa.bool_()),
        ("partition_id", pa.int32()),
    ]
)

# One row per completed partition (checkpoint sidecar).
LINEAGE_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("urls", pa.int64()),
        ("docs_ok", pa.int64()),
        ("docs_failed", pa.int64()),
        ("chars_out", pa.int64()),
        ("route_dom", pa.int64()),
        ("route_text_layer", pa.int64()),
        ("route_ocr", pa.int64()),
        ("wall_s", pa.float64()),
    ]
)
