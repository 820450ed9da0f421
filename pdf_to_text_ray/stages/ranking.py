"""Exact distributed grouped ntile (global ranking without a global
sort).

CCNet (Wenzek et al. 2020) buckets each language's documents into
head/middle/tail by LM-score terciles — an exact per-group ntile over
the whole corpus. A naive implementation is a global
sort-by-(group, score) plus a rank prefix-scan; this module computes
the identical assignment with BOUNDED driver state instead:

1. histogram pass — map-side (group, score) partial counts merge to a
   per-group score histogram (scores are 6-dp rounded, so the
   histogram is bounded by the score grid, not the corpus);
2. boundary resolution — the ntile boundary RANKS are derived from
   group sizes (first ``n mod k`` tiles get the extra row, DuckDB /
   ANSI ntile semantics); only score values whose tie-group straddles
   a boundary need doc-level ordering, and just those doc_ids are
   fetched (a few rows per group) and ranked driver-side;
3. assign pass — map-only: score vs per-group cutoffs, boundary docs
   via the tiny broadcast dict.

Every pass is a ``map_batches`` over the scored dataset; nothing
corpus-sized is sorted, shuffled, or centralized.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pyarrow.compute as pc

import ray


def _hist_partials(batch: pa.Table) -> pa.Table:
    c: Counter = Counter(
        zip(batch["group"].to_pylist(), batch["score"].to_pylist())
    )
    gs, ss, ns = [], [], []
    for (g, s), n in c.items():
        gs.append(g)
        ss.append(s)
        ns.append(n)
    return pa.table(
        {
            "group": pa.array(gs, pa.string()),
            "score": pa.array(ss, pa.float64()),
            "n": pa.array(ns, pa.int64()),
        }
    )


def _tile_sizes(n: int, k: int) -> list[int]:
    q, r = divmod(n, k)
    return [q + 1] * r + [q] * (k - r)


class NtilePlan:
    """Per-group cutoffs + boundary-doc assignments for exact ntile."""

    def __init__(self, cutoffs, boundary):
        # cutoffs: group -> list of (boundary_score, rank_before) per
        # tile edge; boundary: (group, doc_id) -> tile for docs whose
        # score tie-group straddles an edge
        self.cutoffs = cutoffs
        self.boundary = boundary


def build_ntile_plan(scored_ds, n_tiles: int) -> NtilePlan:
    """Histogram pass + boundary resolution. ``scored_ds`` needs
    columns (doc_id, group, score); score ties break by doc_id asc."""
    tables = [
        t
        for t in ray.get(
            scored_ds.map_batches(
                _hist_partials, batch_format="pyarrow", batch_size=None
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    merged = pa.TableGroupBy(
        pa.concat_tables(tables).combine_chunks(), ["group", "score"]
    ).aggregate([("n", "sum")])
    # per-group ascending score walk -> edge scores
    by_group: dict[str, list[tuple[float, int]]] = {}
    for g, s, n in zip(
        merged["group"].to_pylist(),
        merged["score"].to_pylist(),
        merged["n_sum"].to_pylist(),
    ):
        by_group.setdefault(g, []).append((s, n))
    cutoffs: dict[str, list[tuple[float, int, int]]] = {}
    boundary_scores: dict[str, set[float]] = {}
    for g, pairs in by_group.items():
        pairs.sort()
        total = sum(n for _, n in pairs)
        edges = []
        acc = 0
        ranks = []
        for size in _tile_sizes(total, n_tiles)[:-1]:
            acc += size
            ranks.append(acc)  # 1-based rank of the last row of tile
        # for each edge rank find the score holding that rank
        cum = 0
        ei = 0
        for s, n in pairs:
            lo, hi = cum, cum + n  # ranks (lo, hi] hold score s
            while ei < len(ranks) and ranks[ei] <= hi:
                # edge inside this score's tie-group: straddles iff
                # the group extends past the edge
                edges.append((s, lo, ranks[ei]))
                if ranks[ei] < hi:
                    boundary_scores.setdefault(g, set()).add(s)
                ei += 1
            cum = hi
        cutoffs[g] = edges
        boundary_scores.setdefault(g, set())
    # fetch doc_ids of straddling tie-groups only (skinny + tiny)
    all_bscores = sorted(
        {s for ss in boundary_scores.values() for s in ss}
    )
    bscore_ref = ray.put(
        ({g: s for g, s in boundary_scores.items()}, all_bscores)
    )

    def pick(batch: pa.Table) -> pa.Table:
        from ..functions.broadcast import cached_get

        want, scores = cached_get(bscore_ref)
        # vectorized pre-filter on score (boundary scores are a few
        # values); the exact per-group check runs only on survivors
        cand = batch.filter(
            pc.is_in(batch["score"], value_set=pa.array(scores, pa.float64()))
        )
        keep = [
            i
            for i, (g, s) in enumerate(
                zip(cand["group"].to_pylist(), cand["score"].to_pylist())
            )
            if s in want.get(g, ())
        ]
        return cand.take(pa.array(keep, pa.int64())).select(
            ["doc_id", "group", "score"]
        )

    bdocs = pa.concat_tables(
        [
            t
            for t in ray.get(
                scored_ds.map_batches(pick, batch_format="pyarrow")
                .to_arrow_refs()
            )
            if t.num_rows
        ]
        or [
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "group": pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                }
            )
        ]
    )
    # rank straddling tie-groups by doc_id and assign tiles across edges
    boundary: dict[tuple[str, int], int] = {}
    by_gs: dict[tuple[str, float], list[int]] = {}
    for d, g, s in zip(
        bdocs["doc_id"].to_pylist(),
        bdocs["group"].to_pylist(),
        bdocs["score"].to_pylist(),
    ):
        by_gs.setdefault((g, s), []).append(d)
    for (g, s), docs in by_gs.items():
        docs.sort()
        # rank of the tie-group's first doc = lo + 1 (lo recorded with
        # every edge that falls inside this tie-group)
        lo = next(l for (es, l, _r) in cutoffs[g] if es == s)
        edge_ranks = [r for (es, _l, r) in cutoffs[g] if es == s]
        n_below = sum(1 for (es, _l, _r) in cutoffs[g] if es < s)
        for off, d in enumerate(docs):
            rank = lo + 1 + off
            boundary[(g, d)] = (
                1 + n_below + sum(1 for er in edge_ranks if rank > er)
            )
    return NtilePlan(cutoffs, boundary)


def make_ntile_assigner(plan_ref):
    """Map-only pass 3: tile = 1 + edges passed; boundary docs from
    the broadcast dict."""
    from ..functions.broadcast import cached_get

    def assign(batch: pa.Table) -> pa.Table:
        plan: NtilePlan = cached_get(plan_ref)
        tiles = []
        for d, g, s in zip(
            batch["doc_id"].to_pylist(),
            batch["group"].to_pylist(),
            batch["score"].to_pylist(),
        ):
            b = plan.boundary.get((g, d))
            if b is not None:
                tiles.append(b)
                continue
            edges = plan.cutoffs.get(g, [])
            # rank > edge_rank iff score strictly above the edge score
            # (ties fully below/above edges are never boundary docs)
            tiles.append(1 + sum(1 for (es, _l, _r) in edges if s > es))
        return batch.append_column(
            "tile", pa.array(tiles, pa.int64())
        )

    return assign


def ntile_by_group(scored_ds, n_tiles: int = 3):
    """-> input columns + ``tile`` (1-based, ANSI ntile semantics:
    ordered by (score asc, doc_id asc) within each group; the first
    ``n mod k`` tiles carry the extra row)."""
    plan = build_ntile_plan(scored_ds, n_tiles)
    plan_ref = ray.put(plan)
    return scored_ds.map_batches(
        make_ntile_assigner(plan_ref), batch_format="pyarrow"
    )
