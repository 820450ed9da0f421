"""Relational / stream-shaped operators over the TPC-H-ish tables.

The reference has no joins (SURVEY.md §2.4 — its only association is
the filesystem naming convention), but a complete data-processing
engine needs them; these follow the Ray guide patterns:

* large ⋈ large  -> ``Dataset.join`` (hash-partitioned) when available,
  with the explicit bucket-hash fallback documented.
* large ⋈ small  -> broadcast the small side via ``ray.put`` and look
  up inside ``map_batches`` (no shuffle).
* as-of join     -> broadcast small side sorted per key + numpy
  ``searchsorted`` per batch.
* sessionization -> ``groupby(user).map_groups`` over ts-sorted groups
  (Ray Data has no event-time windows; the ordering assumption is
  sort-within-group, which map_groups guarantees after the shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Sum

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


# ------------------------------------------------------------- join

def orders_by_segment(
    orders: ray.data.Dataset, customer: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """orders ⋈ customer (hash-partitioned large-large join) →
    per-mktsegment order count + revenue.

    ``num_partitions`` defaults to cluster_CPUs/4 (floor 8): each join
    partition is a hash-shuffle ACTOR, and measured on this box the
    actor spin-up dominates below ~10^6 rows/partition (8 partitions:
    2.8 s; 32: 16 s on the same sf0.1 input) — so partitions scale
    with the cluster but stay well under one-per-core. At real scale
    pass an explicit value sized to rows/partition, not cores.

    Revenue is summed in integer CENTS: float sums depend on
    accumulation order, so a parallel engine can round differently from
    a serial oracle at a .005 boundary — exact integers can't."""
    if num_partitions is None:
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)) // 4)
    joined = orders.join(
        customer,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def to_cents(t: pa.Table) -> pa.Table:
        cents = pa.compute.cast(
            pa.compute.round(
                pa.compute.multiply(t["o_totalprice"], pa.scalar(100.0))
            ),
            pa.int64(),
        )
        return t.append_column("price_cents", cents)

    return (
        joined.map_batches(to_cents, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("price_cents", alias_name="revenue_cents"),
        )
    )


# ------------------------------------------------------ sessionization

def _sessionize_group(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["ts", "event_id"], kind="mergesort")
    # normalize to microseconds regardless of the pandas datetime unit
    # (arrow timestamp[us] -> datetime64[ns] in pandas<2 would otherwise
    # make the gap constant off by 1000x)
    ts_us = df["ts"].astype("datetime64[us]").astype("int64")
    new_session = (ts_us.diff().fillna(SESSION_GAP_US + 1) > SESSION_GAP_US)
    df = df.assign(session_id=new_session.cumsum().astype("int64") - 1)
    g = df.groupby("session_id", sort=True)
    out = pd.DataFrame(
        {
            "user_id": g["user_id"].first(),
            "session_id": g["session_id"].first(),
            "n_events": g.size().astype("int64"),
            "start_ts": g["ts"].min(),
            "end_ts": g["ts"].max(),
        }
    )
    return out.reset_index(drop=True)


def sessionize(events: ray.data.Dataset) -> ray.data.Dataset:
    """Session windows (30-min inactivity gap) per user —
    ``groupby(user_id).map_groups`` over the ts-sorted group."""
    return events.groupby("user_id").map_groups(
        _sessionize_group, batch_format="pandas"
    )


# ------------------------------------------------------------- as-of

def make_asof_lookup(orders_tbl: pa.Table):
    """Broadcastable CSR-style lookup: (sorted unique keys, group start
    offsets, flat sorted dates). Three numpy arrays serialize through
    the object store zero-copy — a dict of 15k small arrays doesn't."""
    keys = orders_tbl["o_custkey"].to_numpy()
    dates = orders_tbl["o_orderdate"].cast(pa.int64()).to_numpy()
    order = np.lexsort((dates, keys))
    keys, dates = keys[order], dates[order]
    bounds = np.nonzero(np.diff(keys))[0] + 1
    starts = np.concatenate(([0], bounds, [len(keys)]))
    uniq = keys[starts[:-1]]
    return uniq, starts, dates


def make_asof_join(lookup_ref):
    """events batch -> + last_order_date (most recent order with
    o_orderdate <= ts for the same user; NaT when none). Broadcast
    small side + searchsorted: the semi-join shape, no shuffle."""

    def asof(batch: pa.Table) -> pa.Table:
        uniq, starts, flat_dates = ray.get(lookup_ref)
        ts = pa.compute.cast(batch["ts"], pa.int64()).to_numpy()
        uids = batch["user_id"].to_numpy()
        matched = np.full(len(uids), np.int64(0), dtype="int64")
        valid = np.zeros(len(uids), dtype=bool)
        # one vectorized searchsorted per distinct user in the batch
        for uid in np.unique(uids):
            pos = int(np.searchsorted(uniq, uid))
            if pos >= len(uniq) or uniq[pos] != uid:
                continue
            dates = flat_dates[starts[pos] : starts[pos + 1]]
            sel = uids == uid
            idx = np.searchsorted(dates, ts[sel], side="right") - 1
            ok = idx >= 0
            rows = np.nonzero(sel)[0]
            matched[rows[ok]] = dates[idx[ok]]
            valid[rows[ok]] = True
        matched_list = [
            int(m) if v else None for m, v in zip(matched, valid)
        ]
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "last_order_date": pa.array(matched_list, pa.timestamp("us")),
            }
        )

    return asof


# ------------------------------------------------- near-dup clustering

def cluster_pairs_distributed(
    edges: ray.data.Dataset, max_iters: int = 20
) -> ray.data.Dataset:
    """Connected components over an edge Dataset (doc_a, doc_b) by
    iterative min-label propagation — the distributed path for
    candidate sets too large for driver union-find.

    Each round: every node's label becomes min(own, neighbors') via one
    groupby; converged when no label changes. Rounds needed =
    graph diameter (near-dup clusters are shallow: a few rounds).

    -> (doc_id, cluster_id)
    """
    import pyarrow.compute as pc

    # edges feed two consumers (label seeding and the adjacency list);
    # pin the blocks once so a lazy upstream (e.g. the whole MinHash
    # verification pipeline) doesn't execute twice. Pair rows are two
    # int64s — object-store resident, never on the driver.
    edges = edges.materialize()

    def seed(b: pa.Table) -> pa.Table:
        """Per-block LOCAL union-find (combiner): label = min node
        reachable within this block's edges. Rounds then only need to
        stitch across block boundaries — at bench scale (one block)
        the first global round is already the fixed point, and at
        cluster scale the round count drops from graph diameter to
        ~block-graph diameter."""
        a = b["doc_a"].to_pylist()
        bb = b["doc_b"].to_pylist()
        local = cluster_pairs(list(zip(a, bb)))
        nodes = list(local)
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "label": pa.array([local[n] for n in nodes], pa.int64()),
            }
        )

    # labels(node) = min label over the node's blocks
    labels = (
        edges.map_batches(seed, batch_format="pyarrow")
        .groupby("node")
        .min("label")
        .map_batches(
            # by-name (groupby emits "min(label)"): column order after a
            # Ray groupby is an engine convention, not a contract
            lambda t: pa.table({"node": t["node"], "label": t["min(label)"]}),
            batch_format="pyarrow",
        )
    ).materialize()

    # adjacency rows tagged dst>=0; the label row per node is dst=-1.
    # The per-round lookup (label of src forwarded to each dst) is a
    # CO-GROUP: union the edge rows with the label rows and group by
    # src — schema-stable, unlike chaining hash joins whose empty
    # partitions emit zero-column blocks.
    both_dirs = edges.map_batches(
        lambda b: pa.table(
            {
                "src": pa.concat_arrays(
                    [b["doc_a"].combine_chunks(), b["doc_b"].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [b["doc_b"].combine_chunks(), b["doc_a"].combine_chunks()]
                ),
                "label": pa.nulls(2 * b.num_rows, pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def propagate(group: pd.DataFrame) -> pd.DataFrame:
        lbl = group["label"].dropna()
        dsts = group.loc[group["dst"] >= 0, "dst"]
        if lbl.empty or dsts.empty:
            return pd.DataFrame({"node": [], "label": []}).astype(
                {"node": "int64", "label": "int64"}
            )
        return pd.DataFrame(
            {"node": dsts.astype("int64"), "label": int(lbl.min())}
        )

    for _ in range(max_iters):
        tagged_labels = labels.map_batches(
            lambda t: pa.table(
                {
                    "src": t["node"],
                    "dst": pa.nulls(t.num_rows, pa.int64()).fill_null(-1),
                    "label": t["label"],
                }
            ),
            batch_format="pyarrow",
        )
        msgs = (
            both_dirs.union(tagged_labels)
            .groupby("src")
            .map_groups(propagate, batch_format="pandas")
            # normalize to arrow blocks: union() refuses mixed block types
            .map_batches(lambda t: t, batch_format="pyarrow")
        )
        new_labels = (
            msgs.union(labels)
            .groupby("node")
            .min("label")
            .map_batches(
                lambda t: pa.table(
                    {"node": t["node"], "label": t["min(label)"]}
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        # convergence: label multiset unchanged => fixed point (labels
        # only ever decrease, so sum is a sufficient monotone witness)
        if new_labels.sum("label") == labels.sum("label"):
            labels = new_labels
            break
        labels = new_labels
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    )


def cluster_pairs(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find over verified near-dup pairs (driver-side — the
    candidate set is orders of magnitude smaller than the corpus by
    construction; an iterative min-label-propagation groupby is the
    distributed fallback). Returns doc_id -> cluster_id (min member)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}
