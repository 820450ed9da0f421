"""Tokenized-shard export sink (sinks/tokshard.py): byte-level layout,
idx reconstruction, and resume semantics. The per-shard METADATA is
oracle-checked through the registry (token_shard_export); these tests
pin what SQL can't see — the actual .bin/.idx bytes on disk."""

import glob
import hashlib
import os
import re

import numpy as np
import pyarrow.parquet as pq

import ray.data

from pdf_to_text_ray.sinks.tokshard import export_token_shards

_RX = re.compile(r"[^ \t\n\r\f]+")


def _expected_streams(sf_dir: str) -> dict[str, bytes]:
    """Single-process reference: per-lang concatenated little-endian
    uint16 md5-nibble token ids, docs in doc_id order."""
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pandas().sort_values("doc_id")
    streams: dict[str, list[int]] = {}
    for _, r in t.iterrows():
        ids = [
            int(hashlib.md5(w.encode()).hexdigest()[:4], 16)
            for w in _RX.findall(r["text"])
        ]
        streams.setdefault(r["lang"], []).extend(ids)
    return {
        lang: np.asarray(ids, dtype="<u2").tobytes()
        for lang, ids in streams.items()
    }


def _read_stream(out_dir: str, lang: str) -> bytes:
    parts = sorted(glob.glob(os.path.join(out_dir, f"{lang}-*.bin")))
    return b"".join(open(p, "rb").read() for p in parts)


def _docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )


def test_shard_bytes_match_single_process(sf_dir, tmp_path):
    out = str(tmp_path / "shards")
    meta = export_token_shards(
        _docs(sf_dir), out_dir=out, shard_tokens=64
    ).take_all()
    exp = _expected_streams(sf_dir)
    assert set(r["lang"] for r in meta) == set(exp)
    for lang, stream in exp.items():
        got = _read_stream(out, lang)
        assert got == stream, f"{lang}: shard bytes diverge"
        # every shard except the stream's last is exactly full
        parts = sorted(glob.glob(os.path.join(out, f"{lang}-*.bin")))
        for p in parts[:-1]:
            assert os.path.getsize(p) == 64 * 2, p
    # metadata is derived from the same bytes
    for r in meta:
        ids = np.frombuffer(
            open(
                os.path.join(out, f"{r['lang']}-{r['shard_id']:08d}.bin"),
                "rb",
            ).read(),
            dtype="<u2",
        )
        assert r["n_tokens"] == len(ids)
        assert r["tok_sum"] == int(ids.astype(np.int64).sum())
        assert r["first_tok"] == int(ids[0])
        assert r["last_tok"] == int(ids[-1])


def test_idx_reconstructs_documents(sf_dir, tmp_path):
    out = str(tmp_path / "shards")
    export_token_shards(_docs(sf_dir), out_dir=out, shard_tokens=64).take_all()
    # reassemble every doc's id bytes from (doc_id, offset, nbytes)
    # triples across shards, in shard order
    rebuilt: dict[int, list[bytes]] = {}
    for idx_path in sorted(glob.glob(os.path.join(out, "*.idx"))):
        payload = open(idx_path.removesuffix(".idx") + ".bin", "rb").read()
        triples = np.frombuffer(
            open(idx_path, "rb").read(), dtype="<i8"
        ).reshape(-1, 3)
        assert list(triples[:, 1]) == sorted(triples[:, 1])
        for did, off, nb in triples:
            rebuilt.setdefault(int(did), []).append(
                payload[int(off) : int(off) + int(nb)]
            )
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    for _, r in t.iterrows():
        ids = [
            int(hashlib.md5(w.encode()).hexdigest()[:4], 16)
            for w in _RX.findall(r["text"])
        ]
        exp = np.asarray(ids, dtype="<u2").tobytes()
        got = b"".join(rebuilt.get(int(r["doc_id"]), []))
        assert got == exp, f"doc {r['doc_id']} reassembly diverges"


def test_resume_skips_finished_shards(sf_dir, tmp_path):
    out = str(tmp_path / "shards")
    export_token_shards(_docs(sf_dir), out_dir=out, shard_tokens=64).take_all()
    bins = sorted(glob.glob(os.path.join(out, "*.bin")))
    assert len(bins) > 2
    victim = bins[1]
    want = open(victim, "rb").read()
    os.remove(victim)
    os.remove(victim.removesuffix(".bin") + ".idx")
    before = {p: os.path.getmtime(p) for p in bins if p != victim}
    # make any rewrite observable even on coarse mtime clocks
    for p in before:
        os.utime(p, (0, 0))
    before = {p: os.path.getmtime(p) for p in before}
    export_token_shards(_docs(sf_dir), out_dir=out, shard_tokens=64).take_all()
    assert open(victim, "rb").read() == want  # missing shard rebuilt
    for p, m in before.items():
        assert os.path.getmtime(p) == m, f"finished shard rewritten: {p}"
