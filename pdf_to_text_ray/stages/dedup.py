"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram
Jaccard.

Scale shapes (per the Ray guide / SUR­VEY plan):

* exact: vectorized content-hash column in ``map_batches`` →
  ``groupby(hash)`` keep-first — hash-partitioned, no driver state.
* MinHash-LSH near-dup: signatures per batch → explode to
  (band_key, doc_id) rows → ``groupby(band_key)`` emits candidate
  pairs → verification fetches ONLY the candidate texts (byte-budgeted
  broadcast built off-driver; degrades to a hash-partitioned
  ``Dataset.join`` past the budget — see :func:`minhash_near_dups`)
  and computes true Jaccard per pair. Only band *buckets* and
  candidate pairs, never the corpus, live in any one place, so the
  path survives corpora that fit neither driver memory nor a single
  object-store copy.
* SimHash: 64-bit signature, candidates via banded 16-bit chunks,
  verified by Hamming distance.

Everything is deterministic (fixed seeds, md5-derived hashes).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min

from ..functions.hashing import (
    MinHasher,
    jaccard,
    md5_hex,
    shingles,
    simhash64,
)


# ---------- exact dedup ----------

def add_md5_batch(batch: pa.Table) -> pa.Table:
    return batch.append_column(
        "md5_hash",
        pa.array([md5_hex(t) for t in batch["text"].to_pylist()], pa.string()),
    )


def exact_dedup(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Keep the first (min doc_id) row per exact text hash.

    -> (md5_hash, doc_id, n_copies)
    """
    hashed = ds.map_batches(add_md5_batch, batch_format="pyarrow")
    return hashed.groupby("md5_hash").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies")
    )


# ---------- MinHash + LSH ----------

NUM_PERM = 64
NUM_BANDS = 16
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.8


class MinHashStage:
    """MinHasher built once per worker (permutation tables are state —
    ST-style setup per SURVEY §2.3). Used as a task-pool ``map_batches``
    fn via :func:`minhash_task_fn`: the state is cheap to build, and a
    task pool never pins CPUs the way a fixed actor pool does (two
    2-actor pools on a 4-CPU node starve the shuffle between them).
    Heavy-state stages (real OCR models) use the actor-pool form."""

    def __init__(self, num_perm: int = NUM_PERM, num_bands: int = NUM_BANDS):
        self._mh = MinHasher(num_perm=num_perm)
        self._bands = num_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch["doc_id"].to_numpy()
        sigs = self._mh.signatures_batch(
            batch["text"].to_pylist(), SHINGLE_K
        )  # [n_docs, num_perm] in ONE fused permutation pass
        band_keys = [
            key
            for row in sigs
            for key in self._mh.band_keys(row, self._bands)
        ]
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, self._bands), pa.int64()),
                "band_key": pa.array(band_keys, pa.string()),
                "band_part": pa.array(
                    _key_partition(band_keys, NUM_LSH_PARTITIONS), pa.int32()
                ),
            }
        )


# LSH buckets are mostly singletons, so grouping BY band_key gives
# millions of tiny groups (per-group pandas overhead dominates). We
# instead hash band keys into a bounded number of partitions and run a
# vectorized within-partition groupby: each partition holds complete
# buckets (same key -> same partition), singleton keys are dropped with
# one duplicated() mask before any per-group work.
NUM_LSH_PARTITIONS = 64


def _key_partition(keys: list[str], num_partitions: int) -> list[int]:
    import zlib

    return [zlib.crc32(k.encode()) % num_partitions for k in keys]


def _bucket_layout(keys, ids):
    """Sorted-bucket layout for vectorized pair emission: given
    parallel key/id arrays (already restricted to non-singleton
    buckets, (key, id) pairs distinct), returns (ids_sorted, counts,
    starts) where each bucket occupies one contiguous, id-sorted run."""
    import numpy as np

    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    change = np.concatenate(([True], keys[1:] != keys[:-1]))
    bucket = np.cumsum(change) - 1
    counts = np.bincount(bucket)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return ids, counts, starts


def _emit_pairs(values, counts, starts):
    """All within-bucket index pairs, vectorized by bucket SIZE: one
    triu_indices template per distinct size (a handful — LSH buckets
    are tiny), applied to every bucket of that size at once. Returns
    (left_rows, right_rows) as indices into ``values``' index space."""
    import numpy as np

    a_out, b_out = [], []
    for s in np.unique(counts):
        if s < 2:
            continue
        st = starts[counts == s]
        mat = st[:, None] + np.arange(s)[None, :]  # [n_buckets_s, s]
        iu, ju = np.triu_indices(s, 1)
        a_out.append(mat[:, iu].ravel())
        b_out.append(mat[:, ju].ravel())
    if not a_out:
        e = np.empty(0, dtype=np.int64)
        return e, e
    return np.concatenate(a_out), np.concatenate(b_out)


def _partition_pairs(df: pd.DataFrame, key_col: str) -> pd.DataFrame:
    """Candidate pairs within one hash-partition of buckets — fully
    vectorized (no per-bucket Python): singleton buckets drop with one
    duplicated() mask, the rest emit pairs via the per-size triu
    template. Ids are sorted within bucket, so doc_a < doc_b."""
    import numpy as np

    df = df[[key_col, "doc_id"]].drop_duplicates()
    dup = df[df.duplicated(key_col, keep=False)]
    if dup.empty:
        return pd.DataFrame(
            {"doc_a": pd.array([], "int64"), "doc_b": pd.array([], "int64")}
        )
    keys = dup[key_col].to_numpy()
    ids = dup["doc_id"].to_numpy()
    ids, counts, starts = _bucket_layout(keys, ids)
    li, ri = _emit_pairs(ids, counts, starts)
    return pd.DataFrame(
        {
            "doc_a": pd.array(ids[li], "int64"),
            "doc_b": pd.array(ids[ri], "int64"),
        }
    )


def _bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs within one hash-partition of LSH buckets."""
    return _partition_pairs(df, "band_key")


def _pack_pair_keys(t: pa.Table, pre_unique: bool) -> pa.Table:
    """(doc_a, doc_b) -> packed int64 key + bounded partition id.
    Ray's multi-column groupby-aggregate hits a severe cliff on
    few-large-block pair tables (measured 152 s vs 0.2 s on 685k rows
    — the round-4 full-join regime stall), so pair distinct/count runs
    as the repo-standard packed-key bounded-partition reduce instead.
    ``pre_unique`` dedups block-locally first (band multiplicity ≤
    NUM_BANDS, so it shrinks the exchange up to 16×) — only valid when
    the caller doesn't need multiplicities."""
    import numpy as np

    a = t["doc_a"].to_numpy()
    b = t["doc_b"].to_numpy()
    if len(a) and (int(a.max()) >= 1 << 31 or int(b.max()) >= 1 << 31):
        # (a << 32) must stay positive in int64 and b must not bleed
        # into a's bits — same guard as the pagerank/line-dedup packs
        raise ValueError("doc id overflows the packed pair key")
    key = (a << np.int64(32)) | b
    if pre_unique:
        key = np.unique(key)
    return pa.table(
        {
            "key": pa.array(key, pa.int64()),
            "part": pa.array(
                (key % NUM_LSH_PARTITIONS).astype(np.int32), pa.int32()
            ),
        }
    )


def _unique_pairs_partition(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    k = np.unique(df["key"].to_numpy())
    return pd.DataFrame(
        {
            "doc_a": pd.array(k >> 32, "int64"),
            "doc_b": pd.array(k & 0xFFFFFFFF, "int64"),
        }
    )


def _pair_counts_partition(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    k, n = np.unique(df["key"].to_numpy(), return_counts=True)
    return pd.DataFrame(
        {
            "doc_a": pd.array(k >> 32, "int64"),
            "doc_b": pd.array(k & 0xFFFFFFFF, "int64"),
            "n_bands": pd.array(n, "int64"),
        }
    )


def distinct_pairs(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct (doc_a, doc_b) via block-local pre-unique + packed-key
    bounded-partition np.unique — the exchange moves only int64 keys
    and the reduce is one vectorized pass per partition (never a
    per-group aggregate)."""
    return (
        pairs.map_batches(
            lambda t: _pack_pair_keys(t, pre_unique=True),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(_unique_pairs_partition, batch_format="pandas")
    )


def minhash_task_fn(
    batch: pa.Table, num_perm: int = NUM_PERM, num_bands: int = NUM_BANDS
) -> pa.Table:
    from ..functions.broadcast import cached_build

    stage = cached_build(
        ("minhash_stage", num_perm, num_bands),
        lambda: MinHashStage(num_perm, num_bands),
    )
    return stage(batch)


def minhash_candidate_pairs(
    ds: ray.data.Dataset, distinct: bool = True
) -> ray.data.Dataset:
    """documents -> candidate pairs (doc_a < doc_b).

    The same pair can surface from several bands; ``distinct=True``
    dedups with a (doc_a, doc_b) groupby — a full shuffle.
    ``distinct=False`` skips it for callers that dedup more cheaply
    (``minhash_near_dups``'s broadcast regime np.unique's the packed
    pair keys in the same driver pass that already pulls the pair
    blocks — one whole shuffle saved on the hot path)."""
    bands = ds.map_batches(
        minhash_task_fn, batch_format="pyarrow", batch_size=256
    )
    pairs = bands.groupby("band_part").map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    if distinct:
        # packed-key bounded-partition reduce, NOT a (doc_a, doc_b)
        # groupby-aggregate: Ray's multi-column aggregate is ~750×
        # slower on pair tables (see _pack_pair_keys)
        pairs = (
            pairs.map_batches(
                lambda t: _pack_pair_keys(t, pre_unique=False),
                batch_format="pyarrow",
            )
            .groupby("part")
            .map_groups(_pair_counts_partition, batch_format="pandas")
        )
    return pairs


def _pair_sides(batch: pa.Table) -> pa.Table:
    """Explode each candidate pair to two (pair, side_id) rows so the
    verification join fetches both texts by doc_id."""
    a = batch["doc_a"].combine_chunks()
    b = batch["doc_b"].combine_chunks()
    return pa.table(
        {
            "doc_a": pa.concat_arrays([a, a]),
            "doc_b": pa.concat_arrays([b, b]),
            "side_id": pa.concat_arrays([a, b]),
        }
    )


# Verification regimes (mirrors the droplist byte-budget pattern,
# pipelines/extract.py): candidate near-dup pairs are normally a tiny
# fraction of the corpus, so the fast path broadcasts only the
# CANDIDATE texts (never the corpus) under a byte budget; past the
# budget it degrades to the hash-partitioned join, and when even the
# pair-id list outgrows its budget the join runs against the
# unfiltered corpus — each regime strictly correct, only slower.
PAIR_ID_BUDGET_BYTES = 256 * 1024 * 1024  # pair ids on the driver
VERIFY_TEXT_BUDGET_BYTES = 256 * 1024 * 1024  # candidate texts in one object


@ray.remote
def _build_text_lookup(*blocks: pa.Table) -> dict[int, str]:
    """Assemble the candidate-id -> text dict OFF the driver (the
    blocks and the dict only ever live in the object store)."""
    tbl = pa.concat_tables(blocks)
    return dict(zip(tbl["side_id"].to_pylist(), tbl["text"].to_pylist()))


from ..functions.broadcast import cached_get as _cached_get  # noqa: E402


def make_candidate_text_filter(ids_ref):
    """Map-only semi-join: keep only rows whose doc_id is in the
    broadcast sorted candidate-id array."""

    def filt(batch: pa.Table) -> pa.Table:
        import numpy as np

        cand = _cached_get(ids_ref)  # sorted int64 array
        ids = batch["doc_id"].to_numpy()
        pos = np.searchsorted(cand, ids)
        pos_c = np.minimum(pos, len(cand) - 1)
        keep = cand[pos_c] == ids
        if not keep.any():
            return pa.table(
                {"side_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
            )
        sub = batch.filter(pa.array(keep, pa.bool_()))
        return pa.table({"side_id": sub["doc_id"], "text": sub["text"]})

    return filt


def make_pair_verifier(lookup_ref, threshold: float):
    """pairs batch -> (doc_a, doc_b, jaccard >= threshold) using the
    broadcast candidate-text dict; shingle sets are memoized per batch
    so a doc appearing in many pairs is shingled once."""

    def verify(batch: pa.Table) -> pa.Table:
        lookup = _cached_get(lookup_ref)
        sh_cache: dict[int, set] = {}

        def sh(did: int) -> set:
            s = sh_cache.get(did)
            if s is None:
                s = sh_cache[did] = shingles(lookup[did], SHINGLE_K)
            return s

        a_ids = batch["doc_a"].to_pylist()
        b_ids = batch["doc_b"].to_pylist()
        out_a, out_b, sims = [], [], []
        for a, b in zip(a_ids, b_ids):
            sim = jaccard(sh(a), sh(b))
            if sim >= threshold:
                out_a.append(a)
                out_b.append(b)
                sims.append(sim)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(sims, pa.float64()),
            }
        )

    return verify


_EMPTY_VERIFIED = pa.table(
    {
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64()),
    }
)


def _partition_pair_jaccard(df: pd.DataFrame) -> pd.DataFrame:
    """One hash-PARTITION of joined pair rows (complete pairs — same
    pair key → same partition) -> per-pair true shingle Jaccard.
    Grouping by partition instead of by pair avoids one pandas group
    per candidate pair (the per-group-overhead cliff the band-bucket
    path already dodges); shingle sets are memoized per side within
    the partition."""
    df = df.sort_values(["doc_a", "doc_b", "side_id"], kind="mergesort")
    a = df["doc_a"].to_numpy()
    b = df["doc_b"].to_numpy()
    sides = df["side_id"].to_numpy()
    texts = df["text"].tolist()
    sh_cache: dict[int, set] = {}

    def sh(side_idx: int) -> set:
        key = int(sides[side_idx])
        s = sh_cache.get(key)
        if s is None:
            s = sh_cache[key] = shingles(texts[side_idx], SHINGLE_K)
        return s

    out_a, out_b, sims = [], [], []
    i, n = 0, len(df)
    while i + 1 < n:
        if a[i] == a[i + 1] and b[i] == b[i + 1]:
            out_a.append(int(a[i]))
            out_b.append(int(b[i]))
            sims.append(jaccard(sh(i), sh(i + 1)))
            i += 2
        else:  # unmatched side (can't happen after an inner join)
            i += 1
    return pd.DataFrame(
        {
            "doc_a": pd.array(out_a, "int64"),
            "doc_b": pd.array(out_b, "int64"),
            "jaccard": pd.array(sims, "float64"),
        }
    )


def _verify_by_join(
    pairs: ray.data.Dataset,
    texts: ray.data.Dataset,
    threshold: float,
    num_partitions: int,
) -> ray.data.Dataset:
    """Fallback verification: hash-partitioned ``Dataset.join`` of the
    exploded pair sides back to (side_id, text), then per-pair Jaccard
    — neither driver nor any one worker ever holds all texts."""
    sides = pairs.map_batches(_pair_sides, batch_format="pyarrow")
    joined = sides.join(
        texts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("side_id",),
    )

    def tag(batch: pa.Table) -> pa.Table:
        keys = [
            f"{x}:{y}"
            for x, y in zip(
                batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()
            )
        ]
        return batch.append_column(
            "pair_part",
            pa.array(_key_partition(keys, NUM_LSH_PARTITIONS), pa.int32()),
        )

    verified = (
        joined.map_batches(tag, batch_format="pyarrow")
        .groupby("pair_part")
        .map_groups(_partition_pair_jaccard, batch_format="pandas")
    )
    return verified.map_batches(
        lambda t: t.filter(
            pa.compute.greater_equal(t["jaccard"], pa.scalar(threshold))
        ),
        batch_format="pyarrow",
    )


def minhash_near_dups(
    ds: ray.data.Dataset,
    threshold: float = JACCARD_THRESHOLD,
    num_partitions: int = 16,
    pair_budget_bytes: int = PAIR_ID_BUDGET_BYTES,
    text_budget_bytes: int = VERIFY_TEXT_BUDGET_BYTES,
    regime_hook=None,
) -> ray.data.Dataset:
    """Verified near-duplicate pairs with their true Jaccard.

    Three verification regimes, chosen by measured size (all produce
    the identical pair set — tests/test_training_ops.py pins it):

    1. **broadcast** (normal): the pair-id list fits
       ``pair_budget_bytes`` on the driver and the CANDIDATE texts
       (map-side semi-join on broadcast sorted ids) fit
       ``text_budget_bytes`` → the id→text dict is assembled off-driver
       in a Ray task, ``ray.put`` once, and pairs verify in a map-only
       pass — zero extra shuffles.
    2. **filtered join**: candidate texts exceed the text budget → the
       partitioned join runs against the pre-filtered text dataset.
    3. **full join**: even pair ids exceed their budget (a
       duplicate-saturated corpus) → the join runs against the
       unfiltered corpus (``_verify_by_join``), nothing ever
       centralized.

    ``regime_hook``, if given, is called with the chosen regime name
    (``"full_join" | "filtered_join" | "broadcast"``) — a diagnostic so
    the scale tests can prove a budget gate tripped NATURALLY (by data
    volume, not by budget override).

    -> (doc_a, doc_b, jaccard) with jaccard >= threshold
    """
    import numpy as np

    # raw (band-duplicated) pairs: the global distinct groupby is
    # deferred — the broadcast regime dedups driver-side in the same
    # pass that already pulls the pair blocks (duplicate multiplicity
    # is bounded by num_bands, so the budget check stays meaningful),
    # and only the join fallbacks pay for a distributed distinct.
    raw = minhash_candidate_pairs(ds, distinct=False).materialize()
    if raw.size_bytes() > pair_budget_bytes:
        if regime_hook is not None:
            regime_hook("full_join")
        pairs = distinct_pairs(raw)
        texts = ds.map_batches(
            lambda t: pa.table({"side_id": t["doc_id"], "text": t["text"]}),
            batch_format="pyarrow",
        )
        return _verify_by_join(pairs, texts, threshold, num_partitions)

    blocks = ray.get(raw.to_arrow_refs())
    pair_tbl = pa.concat_tables(blocks) if blocks else None
    if pair_tbl is None or pair_tbl.num_rows == 0:
        return ray.data.from_arrow(_EMPTY_VERIFIED)
    uniq = np.unique(
        np.stack(
            [pair_tbl["doc_a"].to_numpy(), pair_tbl["doc_b"].to_numpy()],
            axis=1,
        ),
        axis=0,
    )
    pair_chunks = [
        pa.table(
            {
                "doc_a": pa.array(uniq[i : i + 8192, 0], pa.int64()),
                "doc_b": pa.array(uniq[i : i + 8192, 1], pa.int64()),
            }
        )
        for i in range(0, len(uniq), 8192)
    ]
    pairs = ray.data.from_arrow(pair_chunks)
    cand = np.unique(uniq.ravel())
    ids_ref = ray.put(cand)
    cand_texts = ds.map_batches(
        make_candidate_text_filter(ids_ref), batch_format="pyarrow"
    ).materialize()
    if cand_texts.size_bytes() > text_budget_bytes:
        if regime_hook is not None:
            regime_hook("filtered_join")
        return _verify_by_join(pairs, cand_texts, threshold, num_partitions)
    if regime_hook is not None:
        regime_hook("broadcast")
    lookup_ref = _build_text_lookup.remote(*cand_texts.to_arrow_refs())
    return pairs.map_batches(
        make_pair_verifier(lookup_ref, threshold), batch_format="pyarrow"
    )


# ---------- SimHash ----------

def simhash_batch(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array(
                [int(simhash64(t)) for t in batch["text"].to_pylist()],
                pa.uint64(),
            ),
        }
    )


def _simhash_chunk_rows(batch: pa.Table) -> pa.Table:
    """Explode each signature into 4×16-bit chunk keys (two near-dup
    docs within Hamming distance 3 of each other share ≥1 chunk)."""
    doc_ids, keys, sigs = [], [], []
    for did, sig in zip(
        batch["doc_id"].to_pylist(), batch["simhash"].to_pylist()
    ):
        for c in range(4):
            doc_ids.append(did)
            keys.append(f"{c}:{(sig >> (16 * c)) & 0xFFFF:04x}")
            sigs.append(sig)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "chunk_key": pa.array(keys, pa.string()),
            "simhash": pa.array(sigs, pa.uint64()),
            "chunk_part": pa.array(
                _key_partition(keys, NUM_LSH_PARTITIONS), pa.int32()
            ),
        }
    )


def _simhash_bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """Pairs within one hash-partition of chunk buckets (same
    singleton-skip + vectorized per-size pair emission as
    _bucket_pairs); Hamming distance via xor + unpackbits popcount —
    no per-pair Python."""
    import numpy as np

    df = df[["chunk_key", "doc_id", "simhash"]].drop_duplicates(
        ["chunk_key", "doc_id"]
    )
    dup = df[df.duplicated("chunk_key", keep=False)]
    empty = pd.DataFrame(
        {"doc_a": pd.array([], "int64"), "doc_b": pd.array([], "int64"),
         "hamming": pd.array([], "int64")}
    )
    if dup.empty:
        return empty
    keys = dup["chunk_key"].to_numpy()
    ids = dup["doc_id"].to_numpy()
    sigs = dup["simhash"].to_numpy().astype(np.uint64)
    order = np.lexsort((ids, keys))
    keys, ids, sigs = keys[order], ids[order], sigs[order]
    change = np.concatenate(([True], keys[1:] != keys[:-1]))
    bucket = np.cumsum(change) - 1
    counts = np.bincount(bucket)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    li, ri = _emit_pairs(ids, counts, starts)
    if not len(li):
        return empty
    x = sigs[li] ^ sigs[ri]
    ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(
        axis=1
    ).astype(np.int64)
    keep = ham <= 3
    return pd.DataFrame(
        {
            "doc_a": pd.array(ids[li][keep], "int64"),
            "doc_b": pd.array(ids[ri][keep], "int64"),
            "hamming": pd.array(ham[keep], "int64"),
        }
    )


def _pack_pairs_hamming(t: pa.Table) -> pa.Table:
    """Pair rows + hamming -> packed key/partition (multi-column
    groupby-aggregate avoidance — see _pack_pair_keys)."""
    import numpy as np

    a = t["doc_a"].to_numpy()
    b = t["doc_b"].to_numpy()
    if len(a) and (int(a.max()) >= 1 << 31 or int(b.max()) >= 1 << 31):
        raise ValueError("doc id overflows the packed pair key")
    key = (a << np.int64(32)) | b
    return pa.table(
        {
            "key": pa.array(key, pa.int64()),
            "part": pa.array(
                (key % NUM_LSH_PARTITIONS).astype(np.int32), pa.int32()
            ),
            "hamming": t["hamming"],
        }
    )


def _pair_min_hamming_partition(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    k = df["key"].to_numpy()
    h = df["hamming"].to_numpy()
    order = np.lexsort((h, k))
    k, h = k[order], h[order]
    first = np.empty(len(k), dtype=bool)
    if len(k):
        first[0] = True
        first[1:] = k[1:] != k[:-1]
    k, h = k[first], h[first]
    return pd.DataFrame(
        {
            "doc_a": pd.array(k >> 32, "int64"),
            "doc_b": pd.array(k & 0xFFFFFFFF, "int64"),
            "hamming": pd.array(h, "int64"),
        }
    )


def simhash_near_dups(ds: ray.data.Dataset) -> ray.data.Dataset:
    """documents -> (doc_a, doc_b, hamming) pairs with distance ≤ 3.
    The per-pair min (a pair can surface from several signature
    chunks) reduces as a packed-key bounded-partition lexsort, not a
    multi-column Ray aggregate (the measured ~750× cliff)."""
    sigs = ds.map_batches(simhash_batch, batch_format="pyarrow")
    chunks = sigs.map_batches(_simhash_chunk_rows, batch_format="pyarrow")
    pairs = chunks.groupby("chunk_part").map_groups(
        _simhash_bucket_pairs, batch_format="pandas"
    )
    return (
        pairs.map_batches(_pack_pairs_hamming, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_pair_min_hamming_partition, batch_format="pandas")
    )


# ---------- n-gram Jaccard (exact, small-side broadcast) ----------

class NgramJaccardScorer:
    """Score every doc against a broadcast set of probe docs; emit
    (doc_id, probe_id, jaccard) for pairs over threshold."""

    def __init__(self, probes_ref, k: int = SHINGLE_K, threshold: float = 0.5):
        import ray as _ray

        probes = _ray.get(probes_ref)  # dict probe_id -> text
        self._probes = {pid: shingles(t, k) for pid, t in probes.items()}
        self._k = k
        self._threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, probe_ids, sims = [], [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sh = shingles(text, self._k)
            for pid, psh in self._probes.items():
                if pid == did:
                    continue
                sim = jaccard(sh, psh)
                if sim >= self._threshold:
                    doc_ids.append(did)
                    probe_ids.append(pid)
                    # raw int/int IEEE division — bit-identical to the
                    # DuckDB oracle's (decimal rounding could diverge
                    # at round-half boundaries)
                    sims.append(sim)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "probe_id": pa.array(probe_ids, pa.int64()),
                "jaccard": pa.array(sims, pa.float64()),
            }
        )


# ---------- Bloom-filter membership (Dolma-style seen-set) ----------
# Dolma's exact dedup marks documents against a Bloom filter of
# already-seen keys: O(m/8) bytes of state regardless of key count,
# no false negatives (every key reported "unseen" is genuinely new),
# tunable false-positive rate (an FP silently drops a genuinely-new
# key — acceptable for crawl-frontier and re-crawl suppression).
#
# Build shape: each block reduces its keys to a local m-bit array
# (map-side partial), the arrays OR together driver-side (P blocks x
# m/8 bytes — 128 KiB each; at 10^12 keys you size m per *partition*
# and route keys by hash range so each worker holds one shard of the
# filter; the OR-merge then happens per shard, never globally). The
# merged filter broadcasts once via ray.put, and the probe pass is
# map-only.

import numpy as np  # noqa: E402

BLOOM_M_BITS = 1 << 20  # 128 KiB => <1e-12 FP rate at ~1e4 keys
BLOOM_K = 7


def _bloom_hashes(key: str):
    """(h1, h2) 64-bit pair for double hashing (Kirsch-Mitzenmacher:
    k probes from two md5 halves)."""
    import hashlib

    d = hashlib.md5(key.encode()).digest()
    return (
        int.from_bytes(d[:8], "little"),
        int.from_bytes(d[8:], "little") | 1,
    )


def _bloom_set_bits(keys, m: int, k: int) -> np.ndarray:
    bits = np.zeros(m // 8, dtype=np.uint8)
    for key in keys:
        h1, h2 = _bloom_hashes(key)
        for i in range(k):
            pos = (h1 + i * h2) % m
            bits[pos >> 3] |= 1 << (pos & 7)
    return bits


def _bloom_contains(bits: np.ndarray, key: str, m: int, k: int) -> bool:
    h1, h2 = _bloom_hashes(key)
    for i in range(k):
        pos = (h1 + i * h2) % m
        if not (bits[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def bloom_build(
    ds: ray.data.Dataset,
    key_col: str = "url",
    m: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> np.ndarray:
    """Distributed Bloom build: per-block partial bit arrays, OR-merged
    driver-side. Driver state is P x m/8 bytes of partials (streamed,
    one at a time), never the key set."""

    def partial(batch: pa.Table) -> pa.Table:
        b = _bloom_set_bits(batch[key_col].to_pylist(), m, k)
        return pa.table({"bits": pa.array([b.tobytes()], pa.binary())})

    merged = np.zeros(m // 8, dtype=np.uint8)
    for ref in (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .to_arrow_refs()
    ):
        t = ray.get(ref)
        for raw in t["bits"].to_pylist():
            merged |= np.frombuffer(raw, dtype=np.uint8)
    return merged


def make_bloom_probe(bits_ref, key_col: str = "url", m: int = BLOOM_M_BITS,
                     k: int = BLOOM_K, keep_unseen: bool = True):
    """Map-only probe pass: keep rows whose key is (not) in the filter.
    ``keep_unseen=True`` keeps guaranteed-new rows (no false
    negatives: nothing already-seen survives)."""
    from ..functions.broadcast import cached_get

    def probe(batch: pa.Table) -> pa.Table:
        bits = cached_get(bits_ref)
        seen = np.fromiter(
            (
                _bloom_contains(bits, u, m, k)
                for u in batch[key_col].to_pylist()
            ),
            dtype=bool,
            count=batch.num_rows,
        )
        mask = ~seen if keep_unseen else seen
        return batch.filter(pa.array(mask, pa.bool_()))

    return probe
