"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
with ``ray.put`` and each ``map_batches`` task does one numpy matmul
against its batch (never a per-row loop, never a shuffle). The scale
path is an LSH-bucketed variant: candidates are co-located by
random-hyperplane sign buckets (``groupby(bucket)``), so each query
only scores its bucket — the classic IVF/LSH trade of recall for a
~buckets× smaller scored set.

Deterministic: hyperplanes from a fixed seed; ties broken by vec_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _batch_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"]
    # list<float32> -> [n, d] float64 (float64 keeps the SQL oracle's
    # double-precision cosine bit-comparable after rounding)
    return np.array(col.to_pylist(), dtype=np.float64)


class BruteForceTopK:
    """Per-batch scorer: cosine of batch rows vs the broadcast queries;
    emits (query_id, vec_id, sim) for local top-k; a final small sort
    keeps the global top-k per query."""

    def __init__(self, queries_ref, k: int = 10):
        q = ray.get(queries_ref)  # dict qid -> np.ndarray [d]
        self._qids = sorted(q)
        qm = np.stack([np.asarray(q[i], dtype=np.float64) for i in self._qids])
        self._qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
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
        df["sim"] = df["sim"].round(6)
        return df

    return fn


# Cheap-state stages run as TASK pools with per-worker caches: a fixed
# actor pool pins CPUs for the whole run, and two such pools around a
# shuffle deadlock a small node (2+2 actors on 4 CPUs leave the sort no
# CPU). Actor pools stay the right tool for heavy state (real models).
# Each cache holds ONE entry — only the latest broadcast is live, and
# an unbounded dict leaks a query-matrix copy per run in long-lived
# workers.
_SCORER_CACHE: dict = {}


def _scorer(queries_ref, k: int) -> BruteForceTopK:
    key = (queries_ref.hex(), k)
    sc = _SCORER_CACHE.get(key)
    if sc is None:
        _SCORER_CACHE.clear()
        sc = _SCORER_CACHE[key] = BruteForceTopK(queries_ref, k)
    return sc


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


_BUCKETER_CACHE: dict = {}


def _bucketer(dim: int, n_planes: int) -> HyperplaneBucketer:
    key = (dim, n_planes)
    b = _BUCKETER_CACHE.get(key)
    if b is None:
        b = _BUCKETER_CACHE[key] = HyperplaneBucketer(dim, n_planes)
    return b


def _bucket_task(batch: pa.Table, dim: int = 0, n_planes: int = 4) -> pa.Table:
    return _bucketer(dim, n_planes)(batch)


def _bucket_score_task(
    batch: pa.Table, queries_ref=None, k: int = 10, q_buckets_ref=None
) -> pa.Table:
    out = _scorer(queries_ref, k)(batch)
    q_buckets = _get_q_buckets(q_buckets_ref)
    # keep (query, vec) pairs only when they share the bucket
    vec_bucket = dict(
        zip(batch["vec_id"].to_pylist(), batch["bucket"].to_pylist())
    )
    mask = [
        q_buckets.get(qid) == vec_bucket.get(vid)
        for qid, vid in zip(
            out["query_id"].to_pylist(), out["vec_id"].to_pylist()
        )
    ]
    return out.filter(pa.array(mask, pa.bool_()))


_QBUCKET_CACHE: dict = {}


def _get_q_buckets(ref) -> dict:
    d = _QBUCKET_CACHE.get(ref.hex())
    if d is None:
        _QBUCKET_CACHE.clear()
        d = _QBUCKET_CACHE[ref.hex()] = ray.get(ref)
    return d


def lsh_topk(
    ds: ray.data.Dataset,
    queries_ref,
    dim: int,
    k: int = 10,
    n_planes: int = 4,
) -> ray.data.Dataset:
    """Approximate top-k: score each query only against its own LSH
    bucket. Recall < 1 by design; compare against ann_topk for the
    recall/throughput trade."""
    bucketed = ds.map_batches(
        _bucket_task,
        fn_kwargs={"dim": dim, "n_planes": n_planes},
        batch_format="pyarrow",
        batch_size=4096,
    )
    q = ray.get(queries_ref)
    bucketer = HyperplaneBucketer(dim, n_planes)
    qm = np.stack([np.asarray(q[i], dtype=np.float64) for i in sorted(q)])
    q_buckets = {
        qid: int(b) for qid, b in zip(sorted(q), bucketer.bucket_of(qm))
    }
    q_buckets_ref = ray.put(q_buckets)

    local = bucketed.map_batches(
        _bucket_score_task,
        fn_kwargs={
            "queries_ref": queries_ref,
            "k": k,
            "q_buckets_ref": q_buckets_ref,
        },
        batch_format="pyarrow",
        batch_size=4096,
    )
    return local.groupby("query_id").map_groups(
        _topk_per_query(k), batch_format="pandas"
    )
