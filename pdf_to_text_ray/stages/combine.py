"""Dedup + per-document page reassembly — the pipeline's ONE shuffle.

``pages.groupby("partition_id").map_groups(finalize)`` co-locates every
page of every crawl of a url (partition_id is a pure function of url),
so exact dedup (keep latest ``warc_ts`` — SURVEY.md §2.7), page
reassembly (reference combine semantics — combine_texts.py:3-31,
core_document_generator.py:185-187) and per-partition lineage all
happen in one exchange of *extracted text* (not raw payloads — the
shuffle moves the small table).

Order semantics (SURVEY.md §7 hard part 2): ``numeric`` sorts by page
number (the Streamlit path, core_document_generator.py:157); ``lex``
reproduces the batch path's lexicographic filename-sort quirk
(combine_texts.py:20 → page_1, page_10, page_11, …, page_2).
"""

from __future__ import annotations

import pandas as pd

EXTRACTED_COLUMNS = [
    "url", "text", "doc_type", "lang", "n_pages", "n_chars",
    "routes", "parse_failures", "parse_ok", "partition_id",
]


def _sort_key(order: str):
    if order == "lex":
        return lambda g: g.assign(_k=g["page_no"].map(lambda n: f"page_{n}")).sort_values("_k")
    return lambda g: g.sort_values("page_no")


def make_finalizer(page_separator: str = "\n", order: str = "numeric"):
    sort = _sort_key(order)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        # exact dedup: keep the latest crawl of each url
        latest = df.groupby("url")["warc_ts"].transform("max")
        df = df[df["warc_ts"] == latest]
        rows = []
        for url, g in df.groupby("url", sort=True):
            g = sort(g)
            pages = g[g["route"] != "none"]
            texts = pages["page_text"].fillna("").tolist()
            text = page_separator.join(texts)
            all_ok = bool(g["parse_ok"].all()) and len(pages) > 0
            rows.append(
                {
                    "url": url,
                    "text": text,
                    "doc_type": g["doc_type"].iloc[0],
                    "lang": g["lang"].iloc[0],
                    "n_pages": len(pages),
                    "n_chars": len(text),
                    "routes": pages["route"].tolist(),
                    "parse_failures": int((~g["parse_ok"]).sum()),
                    "parse_ok": all_ok,
                    "partition_id": int(g["partition_id"].iloc[0]),
                }
            )
        out = pd.DataFrame(rows, columns=EXTRACTED_COLUMNS)
        return out.astype(
            {"n_pages": "int32", "n_chars": "int64",
             "parse_failures": "int32", "partition_id": "int32"}
        )

    return finalize


# --- reference-style combiners (exposed as standalone operators) ---

def combine_reference_lex(named_texts: list[tuple[str, str]]) -> str:
    """Batch-CLI combine: lexicographic NAME sort, ``---- name ----``
    header and ``"="*50`` footer per part (combine_texts.py:17-28,
    including the leading blank lines)."""
    out = []
    for name, text in sorted(named_texts, key=lambda p: p[0]):
        out.append(f"\n\n---- {name} ----\n\n")
        out.append(text)
        out.append("\n" + "=" * 50 + "\n")
    return "".join(out)


def combine_page_headers(page_texts: list[str]) -> str:
    """Streamlit-path combine: numeric page order with
    ``\\n\\n--- PAGE {n} ---\\n\\n`` headers
    (core_document_generator.py:185-187)."""
    return "".join(
        f"\n\n--- PAGE {i + 1} ---\n\n{t}" for i, t in enumerate(page_texts)
    )
