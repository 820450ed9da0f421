"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init()``/``ray.shutdown()`` here or in the library
(pdf_to_text_ray never owns a session).

* ``entry()``       — flagship extraction pipeline on sf0.001.
* ``queries()``     — one callable per implemented operator/pipeline
                      (SURVEY.md §2 + training-data ops).
* ``oracle_sql()``  — DuckDB-equivalent SQL for EVERY query (111/111).
                      The MinHash/SimHash sketches, LSH bucketing,
                      clustering (recursive closure), renderers and
                      the payload byte-accounting (size_class_counts:
                      exact HTML/PDF container length reconstruction,
                      stored-block zlib framing) all have full SQL
                      oracles.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthesize the
    Common-Crawl-style docs table, sniff, extract (DOM strip / PDF
    layout parse / OCR actor pool), dedup keep-latest, combine."""
    from pdf_to_text_ray.pipelines.extract import run_extraction

    return run_extraction("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from pdf_to_text_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pdf_to_text_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
