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

# Rolling polynomial hash bases (Rabin–Karp over codepoints). Both are
# odd, so they're invertible mod 2^32 / 2^64 — prefix hashes can be
# differenced with precomputed inverse powers and every shingle/token
# substring hash falls out of ONE vectorized pass over the document
# (no per-shingle hashlib calls; the round-2 profile showed per-shingle
# md5 dominating minhash_near_dups + dup_clusters). The SQL oracles
# (SQL_MINHASH_NEAR_DUPS / SQL_SIMHASH_NEAR_DUPS) reproduce the same
# polynomial per shingle/token string: hash(s) = Σ cp(s[i])·B^(L-1-i)
# mod 2^32 (or 2^64). uint32/uint64 numpy arithmetic wraps — the mod is
# free.
_B32 = 257
_B32_INV = pow(_B32, -1, 1 << 32)
_B64 = 1_000_003
_B64_INV = pow(_B64, -1, 1 << 64)


def _token_stream(toks: list[str]):
    """Codepoint array of ' '.join(toks) plus per-token [start, end)
    offsets. Tokens are \\w+ matches, so the single spaces inserted by
    the join are EXACTLY the separator positions — token boundaries
    come from one vectorized compare, not per-token length bookkeeping.
    utf-32-le gives the exact codepoints zero-copy via frombuffer."""
    s = " ".join(toks)
    c = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    sp = np.nonzero(c == 32)[0]
    starts = np.concatenate(([0], sp + 1))
    ends = np.concatenate((sp, [len(c)]))
    return c, starts, ends


def _prefix_hash(c, base: int, base_inv: int, dtype):
    """(pt, pw) such that the polynomial hash of c[l:r] (mod 2^32 or
    2^64 by dtype) is ``(pt[r] - pt[l]) * pw[r - 1]`` — H(l, r) =
    Σ_{i=l}^{r-1} c[i]·B^(r-1-i): pt accumulates c[i]·B^(-i) so the
    difference telescopes, and the final multiply re-anchors the
    exponent. All ops wrap in the unsigned dtype (exact modular
    arithmetic), fully vectorized."""
    n = len(c)
    pw = np.empty(n + 1, dtype=dtype)
    pw[0] = 1
    np.cumprod(np.full(n, base, dtype=dtype), out=pw[1:])
    pwinv = np.empty(n, dtype=dtype)
    if n:
        pwinv[0] = 1
        np.cumprod(np.full(n - 1, base_inv, dtype=dtype), out=pwinv[1:])
    pt = np.zeros(n + 1, dtype=dtype)
    np.cumsum(c.astype(dtype) * pwinv, dtype=dtype, out=pt[1:])
    return pt, pw


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

    Shingle hashes are base-257 polynomial hashes mod 2^32 of the
    shingle's codepoints, extracted for ALL shingles of a document from
    one prefix-hash pass over ' '.join(tokens) (each k-token shingle is
    a substring of the join) — no per-shingle hashing loop. The SQL
    oracle computes the identical polynomial per shingle string.
    """

    def __init__(self, num_perm: int = 64, seed: int = 12345):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, 1 << 32, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, 1 << 32, size=num_perm, dtype=np.uint64)

    def _shingle_hashes(self, text: str, k: int) -> np.ndarray:
        """uint64[n_unique_shingles] of 32-bit polynomial shingle
        hashes (duplicates dropped — the per-permutation min is
        unaffected and the outer product shrinks)."""
        toks = _RE_TOKEN.findall(text.lower())
        if not toks:
            return np.empty(0, dtype=np.uint64)
        c, starts, ends = _token_stream(toks)
        pt, pw = _prefix_hash(c, _B32, _B32_INV, np.uint32)
        t = len(toks)
        if t < k:
            l, r = starts[:1], ends[-1:]
        else:
            l, r = starts[: t - k + 1], ends[k - 1 :]
        h = (pt[r] - pt[l]) * pw[r - 1]
        return np.unique(h).astype(np.uint64)

    def signature(self, text: str, k: int = 3) -> np.ndarray:
        """uint32[num_perm] MinHash signature."""
        return self.signatures_batch([text], k)[0]

    # shingle-count budget per fused kernel pass: bounds the [num_perm,
    # n_shingles] uint64 temporary (~16 MB at 32k) while amortizing
    # numpy kernel-launch overhead over many documents — per-doc numpy
    # calls were the residual hot spot once hashing itself vectorized.
    _CHUNK_SHINGLES = 32_768

    def signatures_batch(self, texts: list[str], k: int = 3) -> np.ndarray:
        """uint32[n_docs, num_perm] — one fused permutation pass per
        ~_CHUNK_SHINGLES shingles with a segmented per-doc min
        (np.minimum.reduceat), instead of one outer product per doc.
        Docs with no shingles take the all-0xFFFFFFFF signature."""
        xs = [self._shingle_hashes(t, k) for t in texts]
        sigs = np.full((len(texts), self.num_perm), _MAX_HASH, dtype=np.uint32)
        m = np.uint64(_MERSENNE)
        i = 0
        while i < len(xs):
            j, total = i, 0
            while j < len(xs) and (total == 0 or total + len(xs[j]) <= self._CHUNK_SHINGLES):
                total += len(xs[j])
                j += 1
            idx = [d for d in range(i, j) if len(xs[d])]
            if idx:
                cat = np.concatenate([xs[d] for d in idx])
                # p = 2^61-1 is Mersenne: y mod p = (y >> 61) + (y & p)
                # with one conditional subtract (y < 2^64 → quotient
                # ≤ 7, folded sum < 2p) — identical to ``% p``, no
                # 64-bit division per cell.
                y = self.a[:, None] * cat[None, :] + self.b[:, None]
                y = (y >> np.uint64(61)) + (y & m)
                y = np.where(y >= m, y - m, y)
                offs = np.concatenate(
                    ([0], np.cumsum([len(xs[d]) for d in idx])[:-1])
                ).astype(np.int64)
                mins = np.minimum.reduceat(y, offs, axis=1)  # [P, n_docs]
                sigs[idx] = (mins & np.uint64(_MAX_HASH)).astype(np.uint32).T
            i = j
        return sigs

    def band_keys(self, sig: np.ndarray, num_bands: int = 16) -> list[str]:
        """LSH band keys: band index + hex of the band's raw signature
        bytes. LOSSLESS (two docs share a key iff their band rows are
        identical — exactly the SQL oracle's tuple-equality banding;
        the former md5 digest matched only modulo collisions) and
        cheaper than a hash call per band."""
        rows = self.num_perm // num_bands
        return [
            f"{b}:{sig[b * rows : (b + 1) * rows].tobytes().hex()}"
            for b in range(num_bands)
        ]


def token_hashes64(toks: list[str]) -> np.ndarray:
    """uint64 hash per token: base-1000003 polynomial mod 2^64 of the
    token's codepoints, extracted for ALL tokens from one prefix-hash
    pass, then murmur3 fmix64-finalized. The raw polynomial lacks
    avalanche (tokens differing only in the last char get close hash
    values); the finalizer restores uniform bit quality, which SimHash
    bit voting and HyperLogLog trailing-zero ranks both require. SQL
    oracles reproduce the identical polynomial + mix per token."""
    if not toks:
        return np.empty(0, dtype=np.uint64)
    c, starts, ends = _token_stream(toks)
    pt, pw = _prefix_hash(c, _B64, _B64_INV, np.uint64)
    return _fmix64((pt[ends] - pt[starts]) * pw[ends - 1])


def deletion_hashes64(s: str) -> np.ndarray:
    """uint64 hashes of s itself plus every single-character deletion
    of s — the SymSpell edit-distance-1 blocking keys — ALL from one
    prefix-hash pass: H(del_i) = H(prefix_i) * B^(n-1-i) + H(suffix_i)
    (polynomial hashes compose under concatenation), fmix64-finalized.
    Content-only: equal deletion STRINGS from different sources hash
    equal, so blocking completeness is preserved with no per-key
    hashlib call. Returns [n+1] hashes (index 0 = the string itself)."""
    c = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    n = len(c)
    pt, pw = _prefix_hash(c, _B64, _B64_INV, np.uint64)
    out = np.zeros(n + 1, dtype=np.uint64)
    if n:
        # array ops throughout: numpy only warns on SCALAR uint64 wrap,
        # and the mod-2^64 wrap is the point
        out[:1] = (pt[n : n + 1] - pt[0]) * pw[n - 1 : n]
        i = np.arange(n)
        h_pre = np.zeros(n, dtype=np.uint64)
        if n > 1:
            h_pre[1:] = (pt[1:n] - pt[0]) * pw[: n - 1]
        h_suf = (pt[n] - pt[i + 1]) * pw[n - 1]
        out[1:] = h_pre * pw[n - 1 - i] + h_suf
    return _fmix64(out)


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (duplicate tokens keep their
    frequency weight, as SimHash requires)."""
    toks = _RE_TOKEN.findall(text.lower())
    if not toks:
        return 0
    h = token_hashes64(toks)  # [n_tokens] uint64
    shifts = np.arange(64, dtype=np.uint64)
    bits = (h[:, None] >> shifts[None, :]) & np.uint64(1)
    v = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out_bits = (v > 0).astype(np.uint64)
    return int(out_bits @ (np.uint64(1) << shifts))


_FMIX_C1 = np.uint64(0xFF51AFD7ED558CCD)
_FMIX_C2 = np.uint64(0xC4CEB9FE1A85EC53)


def _fmix64(h: np.ndarray) -> np.ndarray:
    """murmur3 64-bit finalizer (xor-shift / multiply avalanche),
    vectorized; uint64 multiply wraps mod 2^64."""
    h = h ^ (h >> np.uint64(33))
    h = h * _FMIX_C1
    h = h ^ (h >> np.uint64(33))
    h = h * _FMIX_C2
    return h ^ (h >> np.uint64(33))


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
