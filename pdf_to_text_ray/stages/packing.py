"""Sequence packing (GPT-style concat-then-chunk) via a distributed
exclusive prefix sum.

Training pipelines concatenate documents per stream (here: per
``lang``) in a deterministic order and slice the token stream into
fixed-budget bins; each document therefore needs its absolute start
offset in the stream — a *global running sum*, which no single
``map_batches`` or ``groupby`` aggregate expresses. This stage
implements the classic two-level scan:

1. **Partial sums** (purely map-side — no shuffle): documents carry a
   deterministic scan-chunk key (``doc_id // chunk_docs``); each block
   collapses to its own (lang, chunk, Σ n_tokens) partials, so only
   chunk-granular rows — tens of bytes per *chunk per block*, not per
   doc — land on the driver, which merges duplicates.
2. **Exclusive scan of chunk totals** on the driver (numpy cumsum over
   the tiny table), broadcast once via ``ray.put``.
3. **Within-chunk fill**: ``groupby(lang, chunk).map_groups`` — each
   group is a *bounded* partition of ``chunk_docs`` skinny rows
   (the dedup.py bounded-partition pattern, never one group per doc) —
   sorts by doc_id and adds its chunk's broadcast offset to a local
   vectorized cumsum.

Scale note: ``chunk_docs`` trades driver memory against group count —
at 10^12 docs, ``chunk_docs=2**20`` gives ~10^6 driver rows (MBs) and
~10^6 groups of ~1M skinny rows (~24 MB each). The default suits the
test corpora.

Token counting is one vectorized Arrow regex pass
(``count_substring_regex(r"\\S+")``), matching the SQL oracle's
``len(regexp_extract_all(text, '\\S+'))`` exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ..functions.broadcast import cached_get

PACK_BUDGET = 512  # tokens per training bin
CHUNK_DOCS = 4096  # docs per scan chunk (see scale note above)


def make_tokenizer(chunk_docs: int = CHUNK_DOCS):
    def tokenize(t: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(t["text"], r"\S+"), pa.int64()
        )
        chunk = pa.array(
            t["doc_id"].to_numpy() // chunk_docs, pa.int64()
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "chunk": chunk,
                "n_tokens": n,
            }
        )

    return tokenize


def chunk_offsets(rows: list[dict]) -> dict[tuple[str, int], int]:
    """Merge + exclusive scan over (lang, chunk, chunk_tokens)
    partials — driver-side, over the TINY chunk-level table only. A
    (lang, chunk) key may appear once per block that touched it; the
    merge sums those partials before scanning."""
    totals: dict[tuple[str, int], int] = {}
    for r in rows:
        key = (r["lang"], r["chunk"])
        totals[key] = totals.get(key, 0) + r["chunk_tokens"]
    offsets: dict[tuple[str, int], int] = {}
    run: dict[str, int] = {}
    for lang, chunk in sorted(totals):
        offsets[(lang, chunk)] = run.get(lang, 0)
        run[lang] = offsets[(lang, chunk)] + totals[(lang, chunk)]
    return offsets


def make_chunk_filler(offsets_ref, budget: int = PACK_BUDGET):
    def fill(df: pd.DataFrame) -> pd.DataFrame:
        # one bounded (lang, chunk) partition, vectorized throughout
        offsets = cached_get(offsets_ref)
        df = df.sort_values("doc_id")
        n = df["n_tokens"].to_numpy()
        base = offsets[(df["lang"].iat[0], int(df["chunk"].iat[0]))]
        start = base + np.concatenate(([0], np.cumsum(n[:-1])))
        first_bin = start // budget
        last_bin = np.where(n > 0, (start + n - 1) // budget, first_bin)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "lang": df["lang"].to_numpy(),
                "n_tokens": n,
                "start_tok": start,
                "bin_id": first_bin,
                "n_bins": last_bin - first_bin + 1,
            }
        )

    return fill


def pack_sequences(
    docs: ray.data.Dataset,
    budget: int = PACK_BUDGET,
    chunk_docs: int = CHUNK_DOCS,
) -> ray.data.Dataset:
    """docs (doc_id, lang, text) -> (doc_id, lang, n_tokens,
    start_tok, bin_id, n_bins): each document's slot in the
    concat-then-chunk token stream of its language."""
    # ``skinny`` is consumed twice (partials, then fill), so the pruned
    # read + one vectorized regex count re-execute — deliberately: at
    # corpus scale re-counting streams, whereas materializing the full
    # skinny projection would park O(corpus) rows in the object store.
    skinny = docs.map_batches(
        make_tokenizer(chunk_docs), batch_format="pyarrow"
    )

    def batch_partials(t: pa.Table) -> pa.Table:
        # map-side combine: each batch collapses to its (lang, chunk)
        # sums, so NO per-doc row ever crosses to the driver — blocks
        # cover contiguous doc_ids, so a batch touches ~batch/chunk_docs
        # chunks. Output columns selected by name (never positional).
        g = t.group_by(["lang", "chunk"]).aggregate([("n_tokens", "sum")])
        return pa.table(
            {
                "lang": g["lang"],
                "chunk": g["chunk"],
                "chunk_tokens": pc.cast(g["n_tokens_sum"], pa.int64()),
            }
        )

    # merge per-block partials driver-side (duplicate (lang, chunk)
    # keys across block boundaries collapse in chunk_offsets' scan)
    partials = skinny.map_batches(
        batch_partials, batch_format="pyarrow", batch_size=None
    ).take_all()
    offsets_ref = ray.put(chunk_offsets(partials))
    return (
        skinny.groupby(["lang", "chunk"])
        .map_groups(make_chunk_filler(offsets_ref, budget),
                    batch_format="pandas")
    )
