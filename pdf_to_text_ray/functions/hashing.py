"""Deterministic hashing / sketching primitives.

Used by: checkpoint partitioning (stable across cluster sizes —
SURVEY.md §7 hard part 5), exact dedup, MinHash/SimHash near-dedup,
and document fingerprinting. Everything is seed-free or fixed-seed so
outputs are identical under any parallelism.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def md5_hex(text: str) -> str:
    """Content hash; matches DuckDB ``md5(text)`` for the SQL oracle."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def stable_u64(text: str) -> int:
    """First 8 bytes of md5 as uint64 — NOT Python hash() (salted per run)."""
    return int.from_bytes(hashlib.md5(text.encode("utf-8")).digest()[:8], "big")


def partition_id(url: str, num_partitions: int) -> int:
    """Deterministic checkpoint partition for a url; independent of block
    layout and cluster size so a resume at different parallelism still
    finds the same partition boundaries."""
    return stable_u64(url) % num_partitions


_RE_TOKEN = re.compile(r"\w+")


def shingles(text: str, k: int = 3) -> set[str]:
    """Word k-shingles of a lowercased document."""
    toks = _RE_TOKEN.findall(text.lower())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


class MinHasher:
    """num_perm universal-hash MinHash over 32-bit shingle hashes.

    h_i(x) = (a_i * x + b_i) mod p  (p = 2^61-1), truncated to 32 bits.
    Parameters are derived from a fixed seed -> deterministic everywhere.

    a, b are drawn below 2^32 so a*x (x is a 32-bit shingle hash) plus b
    fits in uint64 WITHOUT wrapping — drawing them up to p would make
    ``np.outer`` wrap mod 2^64 before the mod-p reduction and silently
    leave the universal hash family.
    """

    def __init__(self, num_perm: int = 64, seed: int = 12345):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, 1 << 32, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, 1 << 32, size=num_perm, dtype=np.uint64)

    def _shingle_hashes(self, sh: set[str]) -> np.ndarray:
        return np.array(
            [int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big") for s in sh],
            dtype=np.uint64,
        )

    def signature(self, text: str, k: int = 3) -> np.ndarray:
        """uint32[num_perm] MinHash signature."""
        sh = shingles(text, k)
        if not sh:
            return np.full(self.num_perm, _MAX_HASH, dtype=np.uint32)
        x = self._shingle_hashes(sh)  # [n]
        # [num_perm, n] — vectorized over both axes
        hv = (np.outer(self.a, x) + self.b[:, None]) % _MERSENNE
        return (hv.min(axis=1) & _MAX_HASH).astype(np.uint32)

    def band_keys(self, sig: np.ndarray, num_bands: int = 16) -> list[str]:
        """LSH band keys: md5 of each band's rows -> bucket ids."""
        rows = self.num_perm // num_bands
        return [
            f"{b}:" + hashlib.md5(sig[b * rows : (b + 1) * rows].tobytes()).hexdigest()[:16]
            for b in range(num_bands)
        ]


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (md5-derived token hashes)."""
    toks = _RE_TOKEN.findall(text.lower())
    if not toks:
        return 0
    v = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    for t in toks:
        h = np.uint64(
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        )
        bits = (h >> shifts) & one
        v += np.where(bits == one, 1, -1)
    out = 0
    for i in range(64):
        if v[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def winnow_fingerprint(text: str, k: int = 5, window: int = 4) -> list[int]:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03):
    polynomial hash over char k-grams (base 257 mod 2^32 — any rolling
    hash family qualifies; this one vectorizes), keep the min hash of
    each window (rightmost min), dedup consecutive picks.

    Fully numpy: k shifted multiply-adds for the gram hashes, a
    sliding-window argmin on the reversed window for rightmost-min
    selection — no per-character python loop.
    """
    s = text.lower()
    n = len(s)
    if n < k:
        return [stable_u64(s) & _MAX_HASH] if s else []
    codes = np.frombuffer(s.encode("utf-8", "replace"), dtype=np.uint8)
    # utf-8 may change length; recompute n over bytes (deterministic)
    n = len(codes)
    if n < k:
        return [stable_u64(s) & _MAX_HASH]
    base = np.uint64(257)
    m = n - k + 1
    hashes = np.zeros(m, dtype=np.uint64)
    for j in range(k):  # k=5 iterations, each a vectorized mul-add
        hashes = hashes * base + codes[j : j + m]
    hashes &= np.uint64(_MAX_HASH)  # mod 2^32
    if m < window:
        idx = m - 1 - int(np.argmin(hashes[::-1]))
        return [int(hashes[idx])]
    # rightmost min per window: argmin over the reversed-column view
    win = np.lib.stride_tricks.sliding_window_view(hashes, window)[:, ::-1]
    rel = window - 1 - np.argmin(win, axis=1)
    idx = np.arange(len(rel)) + rel
    # dedup consecutive picks (same winnowing semantics as the loop)
    keep = np.empty(len(idx), dtype=bool)
    keep[0] = True
    keep[1:] = idx[1:] != idx[:-1]
    return [int(h) for h in hashes[idx[keep]]]
