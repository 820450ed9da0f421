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
import pyarrow as pa

EXTRACTED_COLUMNS = [
    "url", "text", "doc_type", "lang", "n_pages", "n_chars",
    "routes", "parse_failures", "parse_ok", "partition_id",
]


def make_finalizer(page_separator: str = "\n", order: str = "numeric"):
    # Column-wise groupby aggregations, NOT a per-url python loop: one
    # finalize call handles a whole hash-partition (thousands of urls),
    # so per-group DataFrame construction would dominate wall time.
    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        # exact dedup: keep the latest crawl of each url (all pages of
        # one crawl share warc_ts)
        latest = df.groupby("url")["warc_ts"].transform("max")
        df = df[df["warc_ts"] == latest]
        if order == "lex":
            # the reference's lexicographic filename-sort quirk
            df = df.assign(_k="page_" + df["page_no"].astype(str))
            df = df.sort_values(["url", "_k"], kind="mergesort")
        else:
            df = df.sort_values(["url", "page_no"], kind="mergesort")

        meta = df.groupby("url", sort=True).agg(
            doc_type=("doc_type", "first"),
            lang=("lang", "first"),
            partition_id=("partition_id", "first"),
            ok_rows=("parse_ok", "sum"),
            total_rows=("parse_ok", "size"),
        )
        pages = df[df["route"] != "none"].copy()
        pages["page_text"] = pages["page_text"].fillna("")
        pg = pages.groupby("url", sort=True)
        text = pg["page_text"].agg(page_separator.join).reindex(
            meta.index, fill_value=""
        )
        n_pages = pg.size().reindex(meta.index, fill_value=0)
        routes = pg["route"].agg(list).reindex(meta.index)

        out = pd.DataFrame(
            {
                "url": meta.index,
                "text": text.to_numpy(),
                "doc_type": meta["doc_type"].to_numpy(),
                "lang": meta["lang"].to_numpy(),
                "n_pages": n_pages.to_numpy(),
                "n_chars": text.str.len().to_numpy(),
                "routes": [
                    r if isinstance(r, list) else [] for r in routes
                ],
                "parse_failures": (
                    meta["total_rows"] - meta["ok_rows"]
                ).to_numpy(),
                "parse_ok": (
                    (meta["ok_rows"] == meta["total_rows"])
                    & (n_pages > 0)
                ).to_numpy(),
                "partition_id": meta["partition_id"].to_numpy(),
            },
            columns=EXTRACTED_COLUMNS,
        )
        return out.astype(
            {"n_pages": "int32", "n_chars": "int64",
             "parse_failures": "int32", "partition_id": "int32"}
        )

    return finalize


def make_finalizer_arrow(page_separator: str = "\n", order: str = "numeric"):
    """Arrow-native twin of :func:`make_finalizer` for the fused
    doc-extractor path (``map_batches(batch_format="pyarrow")``): the
    batch never round-trips through pandas, so the hottest stage stays
    zero-copy end to end. Byte-identical output is pinned by
    tests/test_extract.py::test_arrow_finalizer_matches_pandas.

    The pandas version remains the ``map_groups`` shuffle-path combine
    (Ray hands groups to ``map_groups`` as pandas frames).
    """
    import pyarrow.compute as pc

    def finalize(t: pa.Table) -> pa.Table:
        # exact dedup: keep the latest crawl of each url (all pages of
        # one crawl share warc_ts). Local hash-join inside the batch.
        latest = (
            t.select(["url", "warc_ts"])
            .group_by("url", use_threads=False)
            .aggregate([("warc_ts", "max")])
        )
        t = t.join(latest, keys="url", join_type="inner")
        t = t.filter(pc.equal(t["warc_ts"], t["warc_ts_max"]))

        if order == "lex":
            # the reference's lexicographic filename-sort quirk
            key = pc.binary_join_element_wise(
                "page_", pc.cast(t["page_no"], pa.string()), ""
            )
            t = t.append_column("_k", key).sort_by(
                [("url", "ascending"), ("_k", "ascending")]
            )
        else:
            t = t.sort_by([("url", "ascending"), ("page_no", "ascending")])

        # doc_type/lang/partition_id are constant per url, so "first"
        # under single-threaded grouping over the url-sorted table is
        # deterministic; selecting output columns strictly BY NAME.
        meta = t.group_by("url", use_threads=False).aggregate(
            [
                ("doc_type", "first"),
                ("lang", "first"),
                ("partition_id", "first"),
                ("parse_ok", "sum"),
                ("parse_ok", "count"),
            ]
        )

        pages = t.filter(pc.not_equal(t["route"], "none"))
        pages = pages.set_column(
            pages.schema.get_field_index("page_text"),
            "page_text",
            pc.fill_null(pages["page_text"], ""),
        )
        pg = pages.group_by("url", use_threads=False).aggregate(
            [("page_text", "list"), ("route", "list"), ("page_no", "count")]
        )
        # Align pg (urls with >=1 real page) to meta (all urls) by
        # position — Acero joins reject list payload columns, and an
        # index_in/take alignment is cheaper than a hash join anyway.
        m = meta.sort_by("url")
        idx = pc.index_in(m["url"], value_set=pg["url"].combine_chunks())
        text = pc.fill_null(
            pc.binary_join(
                pg["page_text_list"].combine_chunks(), page_separator
            ).take(idx),
            "",
        )
        n_pages = pc.fill_null(
            pc.cast(pg["page_no_count"], pa.int32())
            .combine_chunks()
            .take(idx),
            pa.scalar(0, pa.int32()),
        )
        routes = pc.fill_null(
            pg["route_list"].combine_chunks().take(idx),
            pa.scalar([], pa.list_(pa.string())),
        )
        ok = pc.cast(m["parse_ok_sum"], pa.int64())
        total = m["parse_ok_count"]
        return pa.table(
            {
                "url": m["url"],
                "text": text,
                "doc_type": m["doc_type_first"],
                "lang": m["lang_first"],
                "n_pages": n_pages,
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
                "routes": routes,
                "parse_failures": pc.cast(
                    pc.subtract(total, ok), pa.int32()
                ),
                "parse_ok": pc.and_(
                    pc.equal(ok, total),
                    pc.greater(n_pages, pa.scalar(0, pa.int32())),
                ),
                "partition_id": m["partition_id_first"],
            }
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
