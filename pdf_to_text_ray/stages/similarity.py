"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
with ``ray.put`` and each ``map_batches`` task does one numpy matmul
against its batch (never a per-row loop, never a shuffle). The scale
path is an LSH-bucketed variant: vectors and queries get
random-hyperplane sign buckets, and each batch scores only its rows
that fall in some query's bucket, against just that bucket's queries —
the classic IVF/LSH trade of recall for a ~2^n_planes× smaller scored
set, with no shuffle (bucket routing happens inside ``map_batches``,
cheaper at scale than a ``groupby(bucket)`` exchange).

Deterministic: hyperplanes from a fixed seed; ties broken by vec_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ..functions.rounding import round6, round6_np


def _batch_matrix(batch: pa.Table) -> np.ndarray:
    # list<float32> -> [n, d] float64 via the flat Arrow values buffer
    # (near-zero-copy; to_pylist() costs ~20x more). float64 keeps the
    # SQL oracle's double-precision cosine bit-comparable after
    # rounding. Embedding lists are non-null fixed-dim by schema.
    col = batch["embedding"].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.float64, copy=False).reshape(len(col), -1)


class BruteForceTopK:
    """Per-batch scorer: cosine of batch rows vs the broadcast queries;
    emits (query_id, vec_id, sim) for local top-k; a final small sort
    keeps the global top-k per query."""

    def __init__(self, queries_ref, k: int = 10):
        q = ray.get(queries_ref)  # dict qid -> np.ndarray [d]
        self._qids = sorted(q)
        qm = np.stack([np.asarray(q[i], dtype=np.float64) for i in self._qids])
        qnorms = np.linalg.norm(qm, axis=1, keepdims=True)
        qnorms[qnorms == 0] = 1.0  # zero query -> zero sims, not NaN
        self._qm = qm / qnorms
        self._k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ self._qm.T  # [n, q]
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        out_q, out_v, out_s = [], [], []
        k = min(self._k, sims.shape[0])
        for qi, qid in enumerate(self._qids):
            col = sims[:, qi]
            # local top-k (sim desc, vec_id asc) — merged globally later
            idx = np.lexsort((vec_ids, -col))[:k]
            out_q.extend([qid] * len(idx))
            out_v.extend(vec_ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def _topk_per_query(k: int):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = pd.array(range(1, len(df) + 1), "int64")
        df["sim"] = round6_np(df["sim"].to_numpy())
        return df

    return fn


# Cheap-state stages run as TASK pools with per-worker caches: a fixed
# actor pool pins CPUs for the whole run, and two such pools around a
# shuffle deadlock a small node (2+2 actors on 4 CPUs leave the sort no
# CPU). Actor pools stay the right tool for heavy state (real models).
# Derived scorers/bucketers are memoized per worker in the shared
# bounded LRU (functions/broadcast.py).
from ..functions.broadcast import cached_build as _cached_build  # noqa: E402


def _scorer(queries_ref, k: int) -> BruteForceTopK:
    return _cached_build(
        ("bf_topk", queries_ref.hex(), k),
        lambda: BruteForceTopK(queries_ref, k),
    )


def _bf_topk_task(batch: pa.Table, queries_ref=None, k: int = 10) -> pa.Table:
    return _scorer(queries_ref, k)(batch)


def ann_topk(
    ds: ray.data.Dataset,
    queries_ref,
    k: int = 10,
) -> ray.data.Dataset:
    """Brute-force cosine top-k: map_batches matmul -> tiny groupby merge.

    -> (query_id, vec_id, sim, rank)
    """
    local = ds.map_batches(
        _bf_topk_task,
        fn_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
    )
    return local.groupby("query_id").map_groups(
        _topk_per_query(k), batch_format="pandas"
    )


# ---------- LSH-bucketed variant (the scale path) ----------

class HyperplaneBucketer:
    """Sign-pattern bucket of each vector under `n_planes` fixed random
    hyperplanes (seeded) — vectors likely-similar share buckets."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 777):
        rng = np.random.RandomState(seed)
        self._planes = rng.standard_normal((dim, n_planes))

    def bucket_of(self, m: np.ndarray) -> np.ndarray:
        signs = (m @ self._planes) >= 0
        return (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch)
        return batch.append_column(
            "bucket", pa.array(self.bucket_of(m).astype("int64"), pa.int64())
        )


class BucketTopK:
    """Fused route+score stage: one decode, a cheap [n, n_planes]
    routing matmul, then each row is scored ONLY against the queries
    of its own bucket. Rows in no query bucket are dropped before any
    scoring. Scoring FLOPs shrink from n*Q to ~n*Q/2^n_planes — the
    IVF saving (routing always needs the vector; the win is in the
    scoring matmul, so it grows with the query count)."""

    def __init__(
        self,
        queries_ref,
        dim: int,
        n_planes: int = 4,
        k: int = 10,
        seed: int = 777,
    ):
        q = ray.get(queries_ref)
        self._bucketer = HyperplaneBucketer(dim, n_planes, seed)
        self._k = k
        qids = sorted(q)
        qm_raw = np.stack([np.asarray(q[i], dtype=np.float64) for i in qids])
        q_buckets = self._bucketer.bucket_of(qm_raw)
        qnorms = np.linalg.norm(qm_raw, axis=1, keepdims=True)
        qnorms[qnorms == 0] = 1.0  # zero query -> zero sims, not NaN
        qm = qm_raw / qnorms
        grouped: dict[int, list[int]] = {}
        for pos, qid in enumerate(qids):
            grouped.setdefault(int(q_buckets[pos]), []).append(pos)
        self._by_bucket: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for b, poss in grouped.items():
            self._by_bucket[b] = (
                np.asarray([qids[p] for p in poss], dtype=np.int64),
                qm[poss],
            )
        self._wanted = np.asarray(sorted(self._by_bucket), dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
        m = _batch_matrix(batch)
        buckets = self._bucketer.bucket_of(m)
        keep = np.isin(buckets, self._wanted)
        if not keep.any():
            return empty
        m = m[keep]
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        sub_buckets = buckets[keep]
        sub_ids = batch["vec_id"].to_numpy()[keep]
        out_q, out_v, out_s = [], [], []
        for b, (qids, qm) in self._by_bucket.items():
            sel = sub_buckets == b
            if not sel.any():
                continue
            ids_b = sub_ids[sel]
            sims = m[sel] @ qm.T  # [n_bucket_rows, n_bucket_queries]
            k = min(self._k, sims.shape[0])
            for qi, qid in enumerate(qids):
                col = sims[:, qi]
                idx = np.lexsort((ids_b, -col))[:k]
                out_q.extend([int(qid)] * len(idx))
                out_v.extend(ids_b[idx].tolist())
                out_s.extend(col[idx].tolist())
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def _bucket_score_task(
    batch: pa.Table,
    queries_ref=None,
    dim: int = 0,
    n_planes: int = 4,
    k: int = 10,
) -> pa.Table:
    sc = _cached_build(
        ("bucket_topk", queries_ref.hex(), dim, n_planes, k),
        lambda: BucketTopK(queries_ref, dim, n_planes, k),
    )
    return sc(batch)


def lsh_topk(
    ds: ray.data.Dataset,
    queries_ref,
    dim: int,
    k: int = 10,
    n_planes: int = 4,
) -> ray.data.Dataset:
    """Approximate top-k: each query scores ONLY the vectors in its own
    LSH bucket (rows in no query bucket never touch the matmul, or even
    decode their embedding) — FLOPs shrink ~2^n_planes-fold vs
    ann_topk at the cost of recall < 1. Compare against ann_topk for
    the recall/throughput trade (tools/bench_lsh.py)."""
    local = ds.map_batches(
        _bucket_score_task,
        fn_kwargs={
            "queries_ref": queries_ref,
            "dim": dim,
            "n_planes": n_planes,
            "k": k,
        },
        batch_format="pyarrow",
        batch_size=4096,
    )
    return local.groupby("query_id").map_groups(
        _topk_per_query(k), batch_format="pandas"
    )


# ---------- LSH-bucketed near-dup pair generation (the scale path) ----------

def _bucket_tag_task(
    batch: pa.Table, dim: int = 0, n_planes: int = 4, seed: int = 777
) -> pa.Table:
    b = _cached_build(
        ("bucketer", dim, n_planes, seed),
        lambda: HyperplaneBucketer(dim, n_planes, seed),
    )
    return b(batch)


_PAIR_CHUNK_ROWS = 2048


def _pairs_within_bucket(threshold: float):
    def fn(group: pa.Table) -> pa.Table:
        m = _batch_matrix(group)
        ids = group["vec_id"].to_numpy()
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        # chunked matmul: a hot bucket of B rows costs O(chunk*B)
        # memory per step instead of a full B*B sims matrix (compute
        # is the same; only the peak allocation is bounded)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for lo in range(0, len(ids), _PAIR_CHUNK_ROWS):
            hi = min(lo + _PAIR_CHUNK_ROWS, len(ids))
            sims = m[lo:hi] @ m.T  # [chunk, B]
            mask = (sims >= threshold) & (ids[None, :] > ids[lo:hi, None])
            ii, jj = np.nonzero(mask)
            out_a.append(ids[lo + ii])
            out_b.append(ids[jj])
            out_s.append(sims[ii, jj])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        s = np.concatenate(out_s) if out_s else np.empty(0, np.float64)
        return pa.table(
            {
                "vec_a": pa.array(a, pa.int64()),
                "vec_b": pa.array(b, pa.int64()),
                "sim": pa.array(
                    [round6(float(x)) for x in s], pa.float64()
                ),
            }
        )

    return fn


def embedding_near_dups_lsh(
    ds: ray.data.Dataset,
    dim: int,
    threshold: float = 0.1,
    n_planes: int = 4,
    seed: int = 777,
) -> ray.data.Dataset:
    """Near-dup candidate pairs scored ONLY within an LSH bucket —
    the scale path for embedding near-dedup (the corpus-all-pairs
    variant, q_embedding_near_dups, stays as the small-sf oracle).

    Compute per bucket is |bucket|² instead of corpus²; the exchange
    ships one int64 bucket tag per vector plus the embeddings once
    (``groupby(bucket)``). Raise ``n_planes`` with corpus size so
    buckets stay bounded (each plane halves the expected bucket —
    2^n_planes buckets); recall < 1 by design, traded for the
    2^n_planes-fold pair-set reduction.

    -> (vec_a, vec_b, sim) with sim >= threshold, sim rounded to 6dp
    """
    tagged = ds.map_batches(
        _bucket_tag_task,
        fn_kwargs={"dim": dim, "n_planes": n_planes, "seed": seed},
        batch_format="pyarrow",
        batch_size=4096,
    )
    return tagged.groupby("bucket").map_groups(
        _pairs_within_bucket(threshold), batch_format="pyarrow"
    )


# ---------- IVF-bucketed variant (coarse-quantizer scale path) ----------

class IVFTopK:
    """IVF (inverted-file) ANN: a small set of coarse centroids
    partitions the corpus into lists; each query probes only its
    `nprobe` nearest lists and scores only those vectors.

    Fused assign+probe+score per batch — the [n, nlist] routing matmul
    assigns each row to its nearest centroid, rows in no probed list
    are dropped before scoring, and each survivor is scored only
    against the queries probing its list. Same no-shuffle shape as
    BucketTopK; the difference is data-adaptive lists (centroids from
    the corpus) vs data-oblivious hyperplane signs.

    Centroids are a deterministic corpus subset (lowest vec_ids) so
    the DuckDB oracle is exact; a production index would k-means them
    — the routing/probe plumbing is identical either way.
    """

    def __init__(self, queries_ref, centroids_ref, nprobe: int = 2,
                 k: int = 10):
        q = ray.get(queries_ref)
        cents = ray.get(centroids_ref)  # dict cid -> np.ndarray [d]
        self._cids = np.asarray(sorted(cents), dtype=np.int64)
        cm = np.stack(
            [np.asarray(cents[i], dtype=np.float64) for i in self._cids]
        )
        cnorms = np.linalg.norm(cm, axis=1, keepdims=True)
        cnorms[cnorms == 0] = 1.0
        self._cm = cm / cnorms  # [nlist, d]
        self._k = k
        qids = sorted(q)
        qm = np.stack([np.asarray(q[i], dtype=np.float64) for i in qids])
        qnorms = np.linalg.norm(qm, axis=1, keepdims=True)
        qnorms[qnorms == 0] = 1.0
        qm = qm / qnorms
        # probe sets: nprobe nearest centroids per query
        qsims = qm @ self._cm.T  # [Q, nlist]
        # argsort (-sim, cid): nearest first, cid asc on ties
        probe_order = np.lexsort(
            (np.broadcast_to(self._cids, qsims.shape), -qsims), axis=-1
        )[:, :nprobe]
        # per-list query groups: list index -> (query_ids, query_matrix)
        grouped: dict[int, list[int]] = {}
        for pos, qid in enumerate(qids):
            for li in probe_order[pos]:
                grouped.setdefault(int(li), []).append(pos)
        self._by_list: dict[int, tuple[np.ndarray, np.ndarray]] = {
            li: (
                np.asarray([qids[p] for p in poss], dtype=np.int64),
                qm[poss],
            )
            for li, poss in grouped.items()
        }
        self._wanted = np.asarray(sorted(self._by_list), dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
        m = _batch_matrix(batch)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        # assignment: argmax cosine vs centroids, centroid-id asc ties
        csims = m @ self._cm.T  # [n, nlist]
        assign = np.lexsort(
            (np.broadcast_to(self._cids, csims.shape), -csims), axis=-1
        )[:, 0]
        keep = np.isin(assign, self._wanted)
        if not keep.any():
            return empty
        m = m[keep]
        sub_assign = assign[keep]
        sub_ids = batch["vec_id"].to_numpy()[keep]
        out_q, out_v, out_s = [], [], []
        for li, (qids, qm) in self._by_list.items():
            sel = sub_assign == li
            if not sel.any():
                continue
            ids_l = sub_ids[sel]
            sims = m[sel] @ qm.T
            k = min(self._k, sims.shape[0])
            for qi, qid in enumerate(qids):
                col = sims[:, qi]
                idx = np.lexsort((ids_l, -col))[:k]
                out_q.extend([int(qid)] * len(idx))
                out_v.extend(ids_l[idx].tolist())
                out_s.extend(col[idx].tolist())
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def _ivf_score_task(
    batch: pa.Table,
    queries_ref=None,
    centroids_ref=None,
    nprobe: int = 2,
    k: int = 10,
) -> pa.Table:
    sc = _cached_build(
        ("ivf_topk", queries_ref.hex(), centroids_ref.hex(), nprobe, k),
        lambda: IVFTopK(queries_ref, centroids_ref, nprobe, k),
    )
    return sc(batch)


def ivf_topk(
    ds: ray.data.Dataset,
    queries_ref,
    centroids_ref,
    k: int = 10,
    nprobe: int = 2,
) -> ray.data.Dataset:
    """IVF approximate top-k: queries probe `nprobe` of the coarse
    lists; vectors in unprobed lists never reach a scoring matmul.
    Complements lsh_topk: IVF adapts its partitions to the data
    (recall concentrates where vectors cluster) where LSH is
    oblivious. Deduplicate (query, vec) before the merge is NOT
    needed — a vector lives in exactly one list."""
    local = ds.map_batches(
        _ivf_score_task,
        fn_kwargs={
            "queries_ref": queries_ref,
            "centroids_ref": centroids_ref,
            "nprobe": nprobe,
            "k": k,
        },
        batch_format="pyarrow",
        batch_size=4096,
    )
    return local.groupby("query_id").map_groups(
        _topk_per_query(k), batch_format="pandas"
    )
