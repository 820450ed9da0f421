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
   the tiny table), broadcast once via ``ray.put``. The table's size
   is MEASURED first (the pagerank/minhash budget pattern): past
   ``PACK_OFFSETS_BUDGET_BYTES`` the scan itself goes distributed
   (``_pack_distributed``: superchunk reduction -> driver scan of the
   superchunk table only -> per-partition chunk offsets -> sentinel
   rows through the fill groupby; no offsets broadcast at all).
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
# Driver cap for the (lang, chunk) offsets table (the minhash/pagerank
# budget pattern): past this, offsets are computed by the distributed
# two-level scan in _pack_distributed instead of a driver merge.
PACK_OFFSETS_BUDGET_BYTES = 64 * 2**20
SUPER_CHUNKS = 4096  # chunks per superchunk in the distributed scan
_NUM_PACK_PARTITIONS = 64  # bounded-partition fan for the merges


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


def _hash_partition_ids(langs: list, nums: np.ndarray, mod: int) -> np.ndarray:
    """Deterministic bounded partition ids from a (lang string, int)
    key: crc32 per UNIQUE lang (few langs, so no per-row Python cost)
    xor a Knuth-mixed int."""
    import zlib

    crc = {s: zlib.crc32(s.encode()) for s in set(langs)}
    lang_h = np.asarray([crc[s] for s in langs], dtype=np.int64)
    mixed = (nums.astype(np.int64) * 0x9E3779B1) & 0xFFFFFFFF
    return ((lang_h ^ mixed) & (mod - 1)).astype(np.int32)


def _fill_inline_base(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    """Chunk filler for the distributed-offsets regime: the chunk's
    base offset arrives as a sentinel row (doc_id == -1) through the
    SAME (lang, chunk) exchange as the docs — no broadcast of an
    unbounded offsets dict."""
    df = df.sort_values("doc_id")
    is_sent = df["doc_id"].to_numpy() == -1
    base = int(df["n_tokens"].to_numpy()[is_sent][0])
    df = df[~is_sent]
    n = df["n_tokens"].to_numpy()
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


def _pack_distributed(
    skinny: ray.data.Dataset,
    partials_ds: ray.data.Dataset,
    budget: int,
    offsets_budget_bytes: int,
) -> ray.data.Dataset:
    """Beyond-budget offsets regime: the (lang, chunk) table never
    lands on the driver. Classic two-level distributed exclusive scan:

    1. merge per-block chunk partials exactly, in bounded hash
       partitions (Dataset-resident result);
    2. reduce chunks -> superchunks (``chunk // SUPER_CHUNKS``); ONLY
       that (lang, superchunk) table — a further ~SUPER_CHUNKS-fold
       reduction — reaches the driver for the per-lang exclusive scan
       (at 10^12 docs: ~6e4 rows), re-gated against the same budget;
    3. each (lang, superchunk) partition turns its broadcast super
       base into per-chunk base offsets with a local exclusive cumsum;
    4. the per-chunk bases ride the SAME (lang, chunk) groupby as the
       doc rows, as doc_id=-1 sentinel rows — no offsets broadcast.
    """

    def add_part(t: pa.Table) -> pa.Table:
        part = _hash_partition_ids(
            t["lang"].to_pylist(),
            t["chunk"].to_numpy(),
            _NUM_PACK_PARTITIONS,
        )
        return t.append_column("part", pa.array(part, pa.int32()))

    def merge_chunk_partition(df: pd.DataFrame) -> pa.Table:
        g = (
            df.groupby(["lang", "chunk"], sort=False)["chunk_tokens"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "chunk": pa.array(g["chunk"].to_numpy(), pa.int64()),
                "chunk_tokens": pa.array(
                    g["chunk_tokens"].to_numpy(), pa.int64()
                ),
            }
        )

    merged = (
        partials_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_chunk_partition, batch_format="pandas")
        .materialize()  # consumed twice: super partials + offset scan
    )

    def super_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "lang": t["lang"],
                    "chunk": pa.array(
                        t["chunk"].to_numpy() // SUPER_CHUNKS, pa.int64()
                    ),
                    "chunk_tokens": t["chunk_tokens"],
                }
            )
            .group_by(["lang", "chunk"])
            .aggregate([("chunk_tokens", "sum")])
        )
        return pa.table(
            {
                "lang": g["lang"],
                "chunk": pc.cast(g["chunk"], pa.int64()),
                "chunk_tokens": pc.cast(g["chunk_tokens_sum"], pa.int64()),
            }
        )

    super_rows = merged.map_batches(
        super_partial, batch_format="pyarrow"
    ).take_all()
    # the hard driver-safety cap never drops below the module default:
    # a small ``offsets_budget_bytes`` is a regime selector (tests force
    # the distributed path with it), not permission to crash on a
    # super table that is SUPER_CHUNKS-fold smaller than the chunks
    if len(super_rows) * 40 > max(
        offsets_budget_bytes, PACK_OFFSETS_BUDGET_BYTES
    ):
        raise ValueError(
            "pack_sequences: even the superchunk table exceeds the "
            f"driver budget ({len(super_rows)} rows); raise "
            "SUPER_CHUNKS / offsets_budget_bytes or add a scan level"
        )
    # reuse the exact same exclusive scan, at superchunk granularity
    base_ref = ray.put(chunk_offsets(super_rows))

    def add_spart(t: pa.Table) -> pa.Table:
        part = _hash_partition_ids(
            t["lang"].to_pylist(),
            t["chunk"].to_numpy() // SUPER_CHUNKS,
            _NUM_PACK_PARTITIONS,
        )
        return t.append_column("spart", pa.array(part, pa.int32()))

    def offsets_partition(df: pd.DataFrame) -> pa.Table:
        base = cached_get(base_ref)
        out_lang, out_chunk, out_off = [], [], []
        df = df.assign(_sc=df["chunk"].to_numpy() // SUPER_CHUNKS)
        for (lang, sc), g in df.groupby(["lang", "_sc"], sort=False):
            g = g.sort_values("chunk")
            tok = g["chunk_tokens"].to_numpy()
            off = base[(lang, int(sc))] + np.concatenate(
                ([0], np.cumsum(tok[:-1]))
            )
            out_lang.extend([lang] * len(g))
            out_chunk.extend(g["chunk"].tolist())
            out_off.extend(off.tolist())
        return pa.table(
            {
                "doc_id": pa.array([-1] * len(out_lang), pa.int64()),
                "lang": pa.array(out_lang, pa.string()),
                "chunk": pa.array(out_chunk, pa.int64()),
                "n_tokens": pa.array(out_off, pa.int64()),
            }
        )

    sentinels = (
        merged.map_batches(add_spart, batch_format="pyarrow")
        .groupby("spart")
        .map_groups(offsets_partition, batch_format="pandas")
    )
    return (
        skinny.union(sentinels)
        .groupby(["lang", "chunk"])
        .map_groups(
            lambda df: _fill_inline_base(df, budget), batch_format="pandas"
        )
    )


def pack_sequences(
    docs: ray.data.Dataset,
    budget: int = PACK_BUDGET,
    chunk_docs: int = CHUNK_DOCS,
    offsets_budget_bytes: int = PACK_OFFSETS_BUDGET_BYTES,
) -> ray.data.Dataset:
    """docs (doc_id, lang, text) -> (doc_id, lang, n_tokens,
    start_tok, bin_id, n_bins): each document's slot in the
    concat-then-chunk token stream of its language. doc_id must be
    non-negative (-1 is the distributed regime's sentinel)."""
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

    partials_ds = skinny.map_batches(
        batch_partials, batch_format="pyarrow", batch_size=None
    ).materialize()
    # MEASURED gate (the pagerank pattern, relational.py pagerank):
    # partial rows >= distinct (lang, chunk) keys, so 40 bytes x that
    # count conservatively bounds the driver offsets table — it can
    # only overestimate, never under-admit.
    if partials_ds.count() * 40 > offsets_budget_bytes:
        return _pack_distributed(
            skinny, partials_ds, budget, offsets_budget_bytes
        )

    # within budget: merge per-block partials driver-side (duplicate
    # (lang, chunk) keys across block boundaries collapse in
    # chunk_offsets' scan) and broadcast the offsets dict once
    offsets_ref = ray.put(chunk_offsets(partials_ds.take_all()))
    return (
        skinny.groupby(["lang", "chunk"])
        .map_groups(make_chunk_filler(offsets_ref, budget),
                    batch_format="pandas")
    )
