"""Tokenized-shard export sink: fixed-size binary token shards
(``.bin`` + ``.idx``) — the mmap layout a trainer's data loader
consumes, one step past ``corpus_export``'s bin plan.

Layout (per language stream, docs concatenated in doc_id order — the
same deterministic order as stages/packing.py):

- ``{lang}-{shard:08d}.bin`` — exactly ``shard_tokens`` uint16 token
  ids, little-endian (the last shard of a stream may be shorter). A
  document whose tokens straddle a shard boundary is SPLIT across the
  two files, exactly like a fixed-size mmap layout.
- ``{lang}-{shard:08d}.idx`` — one little-endian int64 triple
  ``(doc_id, byte_offset_in_shard, n_bytes)`` per document segment in
  the shard, sorted by offset: enough to map any shard byte back to
  its document.

Tokenizer: a deterministic md5-nibble stand-in (no real BPE vocab in
the sandbox — the reference's own stub-engine precedent,
2_OpenCV_OCR/core_document_processing.py:136-143): token id =
``int(md5(token)[:4], 16)`` over ASCII-whitespace-split tokens, i.e. a
16-bit hash vocabulary. Expressible in SQL nibble arithmetic, so the
shard metadata (count / sum / first / last token id per shard — all
derivable from the shard BYTES) has a DuckDB oracle.

Distribution shape: token ids (2 bytes/token) are produced MAP-SIDE
from the text (so what shuffles is the compact id stream, ~3x smaller
than text); absolute stream offsets come from the packing stage's
chunk-offset scan; the (lang, chunk) groupby slices each doc's ids
into per-shard segments; a bounded-hash partition groupby assembles
each shard's bytes, optionally writes the pair of files (atomic
write + skip-if-present = resumable), and emits one metadata row per
shard.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.broadcast import cached_get
from ..stages.packing import CHUNK_DOCS, PACK_OFFSETS_BUDGET_BYTES, chunk_offsets

SHARD_TOKENS = 4096  # uint16 tokens per .bin shard (8 KiB)
_NUM_SHARD_PARTITIONS = 64

# per-worker token -> id memo (Zipfian text makes this hit-dominated);
# bounded so a pathological vocabulary can't grow it unbounded
_TOK_CACHE: dict[str, int] = {}
_TOK_CACHE_MAX = 1 << 20


def token_id(tok: str) -> int:
    """16-bit md5-nibble token id — int(md5(tok)[:4], 16)."""
    import hashlib

    tid = _TOK_CACHE.get(tok)
    if tid is None:
        tid = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16)
        if len(_TOK_CACHE) < _TOK_CACHE_MAX:
            _TOK_CACHE[tok] = tid
    return tid


def make_tokenize_ids(chunk_docs: int = CHUNK_DOCS):
    """Map stage: (doc_id, lang, text) -> (doc_id, lang, chunk,
    n_tokens, ids) with ids the packed little-endian uint16 bytes.
    ASCII-whitespace split (the explicit class shared with the SQL
    oracle — Python \\S is Unicode, RE2 \\S is ASCII)."""
    import re

    rx = re.compile(r"[^ \t\n\r\f]+")

    def tokenize(t: pa.Table) -> pa.Table:
        ids_col = []
        n_col = []
        for s in t["text"].to_pylist():
            toks = rx.findall(s)
            arr = np.fromiter(
                (token_id(w) for w in toks), np.uint16, count=len(toks)
            )
            ids_col.append(arr.astype("<u2").tobytes())
            n_col.append(len(toks))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "chunk": pa.array(
                    t["doc_id"].to_numpy() // chunk_docs, pa.int64()
                ),
                "n_tokens": pa.array(n_col, pa.int64()),
                "ids": pa.array(ids_col, pa.large_binary()),
            }
        )

    return tokenize


def _shard_part(langs: list, shards: np.ndarray) -> np.ndarray:
    crc = {s: zlib.crc32(s.encode()) for s in set(langs)}
    lang_h = np.asarray([crc[s] for s in langs], dtype=np.int64)
    mixed = (shards.astype(np.int64) * 0x9E3779B1) & 0xFFFFFFFF
    return ((lang_h ^ mixed) & (_NUM_SHARD_PARTITIONS - 1)).astype(np.int32)


def make_segmenter(offsets_ref, shard_tokens: int = SHARD_TOKENS):
    """(lang, chunk) group -> per-(shard) segments of each doc's id
    bytes. A doc overlapping k shards emits k segment rows."""

    def segment(df: pd.DataFrame) -> pa.Table:
        offsets = cached_get(offsets_ref)
        df = df.sort_values("doc_id")
        base = offsets[(df["lang"].iat[0], int(df["chunk"].iat[0]))]
        n = df["n_tokens"].to_numpy()
        start = base + np.concatenate(([0], np.cumsum(n[:-1])))
        out = {
            "doc_id": [], "lang": [], "shard": [], "pos0": [], "seg": []
        }
        lang = df["lang"].iat[0]
        for did, st, ids in zip(
            df["doc_id"].to_numpy(), start, df["ids"].to_numpy()
        ):
            ntok = len(ids) // 2
            pos = int(st)
            off = 0
            while off < len(ids):
                shard = pos // shard_tokens
                take = min(
                    (shard + 1) * shard_tokens - pos, ntok - off // 2
                )
                out["doc_id"].append(int(did))
                out["lang"].append(lang)
                out["shard"].append(shard)
                out["pos0"].append(pos)
                out["seg"].append(ids[off : off + 2 * take])
                pos += take
                off += 2 * take
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "lang": pa.array(out["lang"], pa.string()),
                "shard": pa.array(out["shard"], pa.int64()),
                "pos0": pa.array(out["pos0"], pa.int64()),
                "seg": pa.array(out["seg"], pa.large_binary()),
                "part": pa.array(
                    _shard_part(
                        out["lang"], np.asarray(out["shard"], np.int64)
                    ),
                    pa.int32(),
                ),
            }
        )

    return segment


def _atomic_write_bytes(path: str, payload: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def make_shard_assembler(
    out_dir: str | None, shard_tokens: int = SHARD_TOKENS
):
    """Bounded partition -> one metadata row per shard; when
    ``out_dir`` is set, writes ``.bin``/``.idx`` atomically and SKIPS
    shards whose .bin already exists (resume semantics — same contract
    as state/checkpoint.py's partition writer)."""

    def assemble(df: pd.DataFrame) -> pa.Table:
        rows = {
            "lang": [], "shard_id": [], "n_tokens": [],
            "tok_sum": [], "first_tok": [], "last_tok": [],
        }
        for (lang, shard), g in df.groupby(["lang", "shard"], sort=False):
            g = g.sort_values("pos0")
            payload = b"".join(g["seg"].to_list())
            ids = np.frombuffer(payload, dtype="<u2")
            rows["lang"].append(lang)
            rows["shard_id"].append(int(shard))
            rows["n_tokens"].append(len(ids))
            rows["tok_sum"].append(int(ids.astype(np.int64).sum()))
            rows["first_tok"].append(int(ids[0]))
            rows["last_tok"].append(int(ids[-1]))
            if out_dir is not None:
                bin_path = os.path.join(
                    out_dir, f"{lang}-{int(shard):08d}.bin"
                )
                if not os.path.exists(bin_path):  # resume: done shard
                    base = int(shard) * shard_tokens
                    idx = np.stack(
                        [
                            g["doc_id"].to_numpy().astype(np.int64),
                            (g["pos0"].to_numpy() - base) * 2,
                            np.asarray(
                                [len(s) for s in g["seg"]], np.int64
                            ),
                        ],
                        axis=1,
                    ).astype("<i8")
                    _atomic_write_bytes(
                        bin_path.removesuffix(".bin") + ".idx",
                        idx.tobytes(),
                    )
                    _atomic_write_bytes(bin_path, payload)
        return pa.table(
            {
                "lang": pa.array(rows["lang"], pa.string()),
                "shard_id": pa.array(rows["shard_id"], pa.int64()),
                "n_tokens": pa.array(rows["n_tokens"], pa.int64()),
                "tok_sum": pa.array(rows["tok_sum"], pa.int64()),
                "first_tok": pa.array(rows["first_tok"], pa.int64()),
                "last_tok": pa.array(rows["last_tok"], pa.int64()),
            }
        )

    return assemble


def export_token_shards(
    docs: ray.data.Dataset,
    out_dir: str | None = None,
    shard_tokens: int = SHARD_TOKENS,
    chunk_docs: int = CHUNK_DOCS,
) -> ray.data.Dataset:
    """docs (doc_id, lang, text) -> one metadata row per shard (lang,
    shard_id, n_tokens, tok_sum, first_tok, last_tok); writes the
    .bin/.idx files when ``out_dir`` is given. doc_id must be
    non-negative and unique."""
    tokenized = docs.map_batches(
        make_tokenize_ids(chunk_docs), batch_format="pyarrow"
    ).materialize()  # consumed twice: offsets partials + segmenting

    def partials(t: pa.Table) -> pa.Table:
        g = t.select(["lang", "chunk", "n_tokens"]).group_by(
            ["lang", "chunk"]
        ).aggregate([("n_tokens", "sum")])
        return pa.table(
            {
                "lang": g["lang"],
                "chunk": g["chunk"],
                "chunk_tokens": g["n_tokens_sum"].cast(pa.int64()),
            }
        )

    partials_ds = tokenized.map_batches(
        partials, batch_format="pyarrow", batch_size=None
    ).materialize()
    # MEASURED driver gate (the packing/pagerank pattern). The shard
    # sink keeps the broadcast regime only; past budget, fail loud
    # with the escape hatch (compose _pack_distributed's scan) rather
    # than silently centralizing.
    if partials_ds.count() * 40 > PACK_OFFSETS_BUDGET_BYTES:
        raise RuntimeError(
            "token-shard export: chunk-offsets table exceeds the "
            "driver budget; raise CHUNK_DOCS or route offsets through "
            "stages.packing._pack_distributed's two-level scan"
        )
    offsets_ref = ray.put(chunk_offsets(partials_ds.take_all()))

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
    return (
        tokenized.groupby(["lang", "chunk"])
        .map_groups(
            make_segmenter(offsets_ref, shard_tokens),
            batch_format="pandas",
        )
        .groupby("part")
        .map_groups(
            make_shard_assembler(out_dir, shard_tokens),
            batch_format="pandas",
        )
    )
