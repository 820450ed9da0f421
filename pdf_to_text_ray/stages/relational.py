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
* sessionize/funnel -> users hashed into bounded partitions
  (``groupby(user_part)``), per-key logic vectorized WITHIN each
  partition off sorted run boundaries (Ray Data has no event-time
  windows; one pandas frame per user would be the per-group-overhead
  cliff at real user cardinality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Sum
from ..functions.rounding import round6_np

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
        # floor(x*100 + 0.5), not round(): pyarrow rounds half-even,
        # DuckDB half-away — the floor form matches at exact .5 cents
        cents = pa.compute.cast(
            pa.compute.floor(
                pa.compute.add(
                    pa.compute.multiply(
                        t["o_totalprice"], pa.scalar(100.0)
                    ),
                    pa.scalar(0.5),
                )
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

# Per-key event ops (sessionize, funnel) hash users into a BOUNDED
# number of partitions and vectorize within each partition — one pandas
# frame per user (groupby(user_id).map_groups) is the per-group-
# overhead cliff this codebase engineers around everywhere else
# (dedup.NUM_LSH_PARTITIONS): at 10^8 users the per-group Python
# dominates; at 64 partitions the work is numpy over contiguous runs.
NUM_EVENT_PARTITIONS = 64


def add_user_part(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    part = pc.cast(
        pc.bit_wise_and(
            batch["user_id"], pa.scalar(NUM_EVENT_PARTITIONS - 1, pa.int64())
        ),
        pa.int32(),
    )
    return batch.append_column("user_part", part)


def _ts_us(col: pd.Series) -> "np.ndarray":
    # normalize to microseconds regardless of the pandas datetime unit
    # (arrow timestamp[us] -> datetime64[ns] in pandas<2 would otherwise
    # make gap constants off by 1000x)
    return col.astype("datetime64[us]").astype("int64").to_numpy()


def _sessionize_partition(df: pd.DataFrame) -> pd.DataFrame:
    """One hash-partition of users -> session rows, fully vectorized:
    sort by (user, ts, event_id), flag session starts with one diff
    against the gap (user boundaries always start a session), then
    read every per-session aggregate off the run boundaries — no
    per-user or per-session Python."""
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    uid = df["user_id"].to_numpy()
    ts_us = _ts_us(df["ts"])
    n = len(df)
    new_user = np.empty(n, dtype=bool)
    new_user[0] = True
    new_user[1:] = uid[1:] != uid[:-1]
    gap = np.empty(n, dtype=bool)
    gap[0] = True
    gap[1:] = (ts_us[1:] - ts_us[:-1]) > SESSION_GAP_US
    new_sess = new_user | gap
    seg = np.cumsum(new_sess) - 1  # global session run id
    # per-user session_id = run id relative to the user's first run
    first_seg_of_user = seg[new_user]
    user_idx = np.cumsum(new_user) - 1
    session_id = seg - first_seg_of_user[user_idx]
    starts = np.flatnonzero(new_sess)
    ends = np.concatenate((starts[1:], [n]))
    return pd.DataFrame(
        {
            "user_id": pd.array(uid[starts], "int64"),
            "session_id": pd.array(session_id[starts], "int64"),
            "n_events": pd.array(ends - starts, "int64"),
            # rows are ts-sorted within a session run: first = min,
            # last = max
            "start_ts": pd.Series(ts_us[starts].astype("datetime64[us]")),
            "end_ts": pd.Series(ts_us[ends - 1].astype("datetime64[us]")),
        }
    )


def sessionize(events: ray.data.Dataset) -> ray.data.Dataset:
    """Session windows (30-min inactivity gap) per user — users hashed
    into NUM_EVENT_PARTITIONS bounded partitions (map-side), sessions
    computed vectorized within each partition."""
    return (
        events.map_batches(add_user_part, batch_format="pyarrow")
        .groupby("user_part")
        .map_groups(_sessionize_partition, batch_format="pandas")
    )


def _funnel_partition(df: pd.DataFrame) -> pd.DataFrame:
    """One hash-partition of users -> (user, first signup, first
    purchase at/after it), vectorized: first signup per user off the
    sorted run boundaries, purchases matched to their user's signup by
    searchsorted, first qualifying purchase again off run boundaries."""
    df = df.sort_values(["user_id", "ts"], kind="mergesort")
    uid = df["user_id"].to_numpy()
    ts_us = _ts_us(df["ts"])
    ev = df["event_type"].to_numpy()

    m_sign = ev == "signup"
    su, st = uid[m_sign], ts_us[m_sign]
    if not len(su):
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "signup_ts_us": pa.array([], pa.int64()),
                "purchase_ts_us": pa.array([], pa.int64()),
                "converted": pa.array([], pa.bool_()),
            }
        )
    first_s = np.empty(len(su), dtype=bool)
    first_s[0] = True
    first_s[1:] = su[1:] != su[:-1]
    s_users, s0 = su[first_s], st[first_s]  # sorted unique users

    m_pur = ev == "purchase"
    pu, pt = uid[m_pur], ts_us[m_pur]
    pos = np.searchsorted(s_users, pu)
    pos_c = np.minimum(pos, len(s_users) - 1)
    qual = (s_users[pos_c] == pu) & (pt >= s0[pos_c])
    vu, vt = pu[qual], pt[qual]
    p0 = np.full(len(s_users), 0, dtype="int64")
    has_p = np.zeros(len(s_users), dtype=bool)
    if len(vu):
        first_p = np.empty(len(vu), dtype=bool)
        first_p[0] = True
        first_p[1:] = vu[1:] != vu[:-1]
        ppos = np.searchsorted(s_users, vu[first_p])
        p0[ppos] = vt[first_p]
        has_p[ppos] = True
    # Arrow int64/bool with a null mask, not pandas "Int64"/"boolean"
    # masked extension dtypes: extension arrays hash-canonicalize
    # differently from Arrow nullable columns downstream.
    return pa.table(
        {
            "user_id": pa.array(s_users, pa.int64()),
            "signup_ts_us": pa.array(s0, pa.int64()),
            "purchase_ts_us": pa.array(p0, pa.int64(), mask=~has_p),
            "converted": pa.array(has_p, pa.bool_()),
        }
    )


def _running_total_partition(df: pd.DataFrame) -> pd.DataFrame:
    """One hash-partition of users -> per-event cumulative value sum
    (the SQL window SUM() OVER (PARTITION BY user ORDER BY ts,
    event_id)), fully vectorized: one sort, one cumsum, user-boundary
    rebase off the run starts. Values are summed in integer cents —
    a float running sum would drift with accumulation order."""
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    uid = df["user_id"].to_numpy()
    # floor(x*100 + 0.5): no round-half-MODE ambiguity (np.round is
    # half-to-even, DuckDB round() half-away — they disagree on exact
    # .5 cents; the floor form is identical in both engines)
    cents = np.floor(
        df["value"].to_numpy() * 100.0 + 0.5
    ).astype("int64")
    n = len(df)
    if n == 0:
        return pd.DataFrame(
            {
                "event_id": pd.array([], "int64"),
                "user_id": pd.array([], "int64"),
                "running_cents": pd.array([], "int64"),
            }
        )
    csum = np.cumsum(cents)
    new_user = np.empty(n, dtype=bool)
    new_user[0] = True
    new_user[1:] = uid[1:] != uid[:-1]
    starts = np.flatnonzero(new_user)
    base = (csum[starts] - cents[starts])[np.cumsum(new_user) - 1]
    return pd.DataFrame(
        {
            "event_id": df["event_id"].to_numpy(),
            "user_id": uid,
            "running_cents": csum - base,
        }
    )


def running_total(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-user cumulative value window — users hashed into
    NUM_EVENT_PARTITIONS bounded partitions, the window computed
    vectorized within each (the distributed window-function shape:
    partition by the window key, never one pandas frame per user)."""
    return (
        events.map_batches(add_user_part, batch_format="pyarrow")
        .groupby("user_part")
        .map_groups(_running_total_partition, batch_format="pandas")
    )


def funnel_conversion(events: ray.data.Dataset) -> ray.data.Dataset:
    """Signup -> purchase funnel per user. Callers should pre-filter
    event_type map-side; this hashes users into bounded partitions and
    computes both funnel stages vectorized within each."""
    return (
        events.map_batches(add_user_part, batch_format="pyarrow")
        .groupby("user_part")
        .map_groups(_funnel_partition, batch_format="pandas")
    )


def _ewma_partition(df: pd.DataFrame) -> pd.DataFrame:
    """One hash-partition of users -> final EWMA (alpha=1/2) of value
    over (ts, event_id) order, fully vectorized: one sort, per-user
    ranks off the run boundaries, dyadic 0.5**k weights (exact in
    float64), one np.add.reduceat per partition. The recurrence
    EWMA_t = (EWMA_{t-1} + v_t)/2 with EWMA_1 = v_1 unrolls to
    w_1 = 0.5^(n-1), w_t = 0.5^(n-t+1) for t >= 2 — a weighted dot
    product, no sequential Python fold. 6-dp rounded (float sum order
    differs from the oracle's)."""
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    n = len(df)
    if n == 0:
        return pd.DataFrame(
            {
                "user_id": pd.array([], "int64"),
                "ewma": pd.array([], "float64"),
            }
        )
    uid = df["user_id"].to_numpy()
    val = df["value"].to_numpy()
    new_user = np.empty(n, dtype=bool)
    new_user[0] = True
    new_user[1:] = uid[1:] != uid[:-1]
    starts = np.flatnonzero(new_user)
    user_idx = np.cumsum(new_user) - 1
    counts = np.diff(np.concatenate((starts, [n])))
    rank = np.arange(n) - starts[user_idx] + 1  # 1-based within user
    n_u = counts[user_idx]
    exps = n_u - rank + 1
    exps[rank == 1] = n_u[rank == 1] - 1
    # 0.5**k is exact dyadic; underflows to 0 beyond k~1074, where the
    # contribution is below any representable difference anyway
    contrib = val * np.power(0.5, exps.astype("float64"))
    sums = np.add.reduceat(contrib, starts)
    return pd.DataFrame(
        {
            "user_id": pd.array(uid[starts], "int64"),
            "ewma": round6_np(sums),
        }
    )


def ewma(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-user exponential moving average (order-dependent window
    fold) — users hashed into NUM_EVENT_PARTITIONS bounded partitions,
    the fold computed as a vectorized weighted sum within each."""
    return (
        events.map_batches(add_user_part, batch_format="pyarrow")
        .groupby("user_part")
        .map_groups(_ewma_partition, batch_format="pandas")
    )


def _last_value_partition(df: pd.DataFrame) -> pd.DataFrame:
    """One hash-partition of users -> LAST_VALUE(value) by (ts,
    event_id): one sort, last row of each user run — the distributed
    argmax shape (selection, not arithmetic: output floats are exact)."""
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    n = len(df)
    if n == 0:
        return pd.DataFrame(
            {
                "user_id": pd.array([], "int64"),
                "last_value": pd.array([], "float64"),
            }
        )
    uid = df["user_id"].to_numpy()
    new_user = np.empty(n, dtype=bool)
    new_user[0] = True
    new_user[1:] = uid[1:] != uid[:-1]
    starts = np.flatnonzero(new_user)
    lasts = np.concatenate((starts[1:] - 1, [n - 1]))
    return pd.DataFrame(
        {
            "user_id": pd.array(uid[starts], "int64"),
            "last_value": df["value"].to_numpy()[lasts],
        }
    )


def last_value(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-user LAST_VALUE window (argmax by event time) over bounded
    user-hash partitions."""
    return (
        events.map_batches(add_user_part, batch_format="pyarrow")
        .groupby("user_part")
        .map_groups(_last_value_partition, batch_format="pandas")
    )


def _markov_partition(df: pd.DataFrame) -> pd.DataFrame:
    """One user-hash partition -> (from_type, to_type, n) transition
    counts over each user's (ts, event_id)-ordered event sequence:
    one sort, shifted equality for user boundaries, one vectorized
    pair-groupby. Emits PARTIAL counts (<= type-vocab^2 rows per
    partition); callers merge the tiny partials."""
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    uid = df["user_id"].to_numpy()
    et = df["event_type"].to_numpy()
    if len(df) < 2:
        return pd.DataFrame(
            {
                "from_type": np.array([], dtype=object),
                "to_type": np.array([], dtype=object),
                "n": np.array([], dtype="int64"),
            }
        )
    same = uid[1:] == uid[:-1]
    out = (
        pd.DataFrame(
            {"from_type": et[:-1][same], "to_type": et[1:][same]}
        )
        .groupby(["from_type", "to_type"], sort=False)
        .size()
        .reset_index(name="n")
    )
    out["n"] = out["n"].astype("int64")
    return out


def markov_transitions(events: ray.data.Dataset) -> ray.data.Dataset:
    """Event-type transition matrix (Markov chain counts): per-user
    consecutive event pairs, counted. Users hash into bounded
    partitions (each user's full sequence lands in one), pair counts
    reduce within each partition to <= vocab^2 rows, and the final
    merge sums the tiny partials in one single-block pass — the big
    event stream never shuffles by pair key."""

    def merge(t: pa.Table) -> pa.Table:
        g = (
            t.to_pandas()
            .groupby(["from_type", "to_type"], sort=False, as_index=False)[
                "n"
            ]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        events.map_batches(add_user_part, batch_format="pyarrow")
        .groupby("user_part")
        .map_groups(_markov_partition, batch_format="pandas")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )


INTERVAL_COVERAGE_WINDOW_US = 900_000_000  # 15 min


def _coverage_partition(df: pd.DataFrame) -> pd.DataFrame:
    """One user-hash partition -> per-user total covered time: each
    event opens a fixed [ts, ts+W) interval; overlapping/touching
    intervals merge (gaps-and-islands) and the union length sums.
    Vectorized: one sort, per-user cumulative max end (C-level pandas
    groupby cummax), island boundaries off a shifted compare, then one
    island groupby for min-start/max-end. All arithmetic is int64
    microseconds — exact, order-independent."""
    w = INTERVAL_COVERAGE_WINDOW_US
    df = df.sort_values(["user_id", "ts"], kind="mergesort")
    uid = df["user_id"].to_numpy()
    n = len(df)
    if n == 0:
        return pd.DataFrame(
            {
                "user_id": np.array([], dtype="int64"),
                "covered_us": np.array([], dtype="int64"),
            }
        )
    s = _ts_us(df["ts"])
    e = s + w
    cummax_e = (
        pd.Series(e).groupby(pd.Series(uid), sort=False).cummax().to_numpy()
    )
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = uid[1:] != uid[:-1]
    # touching intervals (s == prev max end) merge: strict > breaks
    brk = first.copy()
    brk[1:] |= s[1:] > cummax_e[:-1]
    island = np.cumsum(brk) - 1
    isl = pd.DataFrame({"u": uid, "i": island, "s": s, "e": e}).groupby(
        "i", sort=False
    )
    per_island = isl.agg(u=("u", "first"), mn=("s", "min"), mx=("e", "max"))
    cov = (
        (per_island["mx"] - per_island["mn"])
        .groupby(per_island["u"], sort=False)
        .sum()
    )
    return pd.DataFrame(
        {
            "user_id": cov.index.to_numpy().astype("int64"),
            "covered_us": cov.to_numpy().astype("int64"),
        }
    )


def interval_coverage(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-user interval-union coverage (merge overlapping windows,
    sum the union length) — the gaps-and-islands shape, hashed into
    bounded user partitions and computed vectorized within each."""
    return (
        events.map_batches(add_user_part, batch_format="pyarrow")
        .groupby("user_part")
        .map_groups(_coverage_partition, batch_format="pandas")
    )


def _running_distinct_partition(df: pd.DataFrame) -> pd.DataFrame:
    """One user-hash partition -> per-event RUNNING DISTINCT count of
    event types seen so far by that user (inclusive), in (ts,
    event_id) order. Vectorized: first-occurrence flags from one
    duplicated() pass over (user, type) in sorted order, cumsum
    rebased at user boundaries."""
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    n = len(df)
    if n == 0:
        return pd.DataFrame(
            {
                "event_id": np.array([], dtype="int64"),
                "n_distinct_types": np.array([], dtype="int64"),
            }
        )
    uid = df["user_id"].to_numpy()
    isfirst = (
        ~df.duplicated(subset=["user_id", "event_type"])
    ).to_numpy()
    cs = np.cumsum(isfirst.astype(np.int64))
    new_user = np.empty(n, dtype=bool)
    new_user[0] = True
    new_user[1:] = uid[1:] != uid[:-1]
    starts = np.flatnonzero(new_user)
    base = (cs[starts] - isfirst[starts])[np.cumsum(new_user) - 1]
    return pd.DataFrame(
        {
            "event_id": df["event_id"].to_numpy(),
            "n_distinct_types": cs - base,
        }
    )


def running_distinct(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-event running count of DISTINCT event types per user — the
    windowed count(DISTINCT) shape SQL window functions can't express
    directly. Bounded user-hash partitions, vectorized within each."""
    return (
        events.map_batches(add_user_part, batch_format="pyarrow")
        .groupby("user_part")
        .map_groups(_running_distinct_partition, batch_format="pandas")
    )


def pareto_keep(x: "np.ndarray", y: "np.ndarray") -> "np.ndarray":
    """Skyline mask: keep row i iff no row has (x >= x_i AND y >= y_i)
    with strict > in at least one coordinate (maximize both). Exact
    integer inputs; ties on both coordinates keep every copy (neither
    dominates). O(n log n): per-unique-x max-y suffix scan and the
    symmetric pass, no pairwise loop."""
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    lo = np.iinfo(np.int64).min

    def dominated(a, b):
        # exists row with a' strictly > a and b' >= b
        ua = np.unique(a)
        ai = np.searchsorted(ua, a)
        mx = np.full(len(ua), lo, dtype=np.int64)
        np.maximum.at(mx, ai, b)
        rev = np.maximum.accumulate(mx[::-1])[::-1]  # max over >= group
        sg = np.concatenate([rev[1:], [lo]])  # max over STRICTLY greater
        return sg[ai] >= b

    return ~(dominated(x, y) | dominated(y, x))


# ------------------------------------------------------------- as-of

def _csr_lookup(keys, times, *payloads):
    """Shared CSR build for the broadcast temporal lookups: sort by
    (key, time), find group boundaries, return (sorted unique keys,
    group start offsets, sorted flat times, *sorted payloads). Safe on
    empty input (zero keys -> zero groups)."""
    keys = np.asarray(keys, dtype=np.int64)
    times = np.asarray(times, dtype=np.int64)
    order = np.lexsort((times, keys))
    keys, times = keys[order], times[order]
    sorted_payloads = tuple(
        np.asarray(p, dtype=np.int64)[order] for p in payloads
    )
    if len(keys):
        bounds = np.nonzero(np.diff(keys))[0] + 1
        starts = np.concatenate(([0], bounds, [len(keys)]))
        uniq = keys[starts[:-1]]
    else:
        starts = np.array([0], dtype=np.int64)
        uniq = keys
    return (uniq, starts, times) + sorted_payloads


def make_asof_lookup(orders_tbl: pa.Table):
    """Broadcastable CSR-style lookup: (sorted unique keys, group start
    offsets, flat sorted dates). Three numpy arrays serialize through
    the object store zero-copy — a dict of 15k small arrays doesn't."""
    return _csr_lookup(
        orders_tbl["o_custkey"].to_numpy(),
        orders_tbl["o_orderdate"].cast(pa.int64()).to_numpy(),
    )


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


# -------------------------------------------------------- range join

RANGE_JOIN_WINDOW_US = 3600 * 1_000_000  # 1 hour


def make_range_lookup(keys, times, ids):
    """Broadcastable CSR lookup for an interval join's ANCHOR side:
    (sorted unique keys, group start offsets, per-key time-sorted flat
    anchor times, matching anchor ids). Same shape as
    ``make_asof_lookup`` plus the id payload — four numpy arrays,
    zero-copy through the object store. The anchor side must be the
    broadcastable one (e.g. one event type out of many); a
    large x large interval join needs time-bucketed partitioning
    instead. Empty anchors -> empty lookup -> zero matches, like the
    SQL inner join."""
    return _csr_lookup(keys, times, ids)


def make_range_join_partials(
    lookup_ref, window_us: int = RANGE_JOIN_WINDOW_US
):
    """probe-events batch -> per-anchor PARTIAL aggregates
    (anchor_id, n_follow, value_cents) over anchors with
    anchor_ts <= ts < anchor_ts + window, same user.

    A range join is Ray-Data-expressible as broadcast + vectorized
    interval probe: the anchor side is a CSR lookup per user, each
    probe event finds its matching anchor window with two searchsorted
    calls (anchor times in (ts - window, ts]), and the one-to-MANY
    expansion (a probe can fall in SEVERAL overlapping anchor
    windows) is the repeat/arange trick — no per-event Python.
    Partials are combined per batch so only anchor-grained rows reach
    the final small groupby; value is summed in integer cents (float
    sums are accumulation-order-dependent, ints are exact)."""
    import pyarrow.compute as pc

    def partials(batch: pa.Table) -> pa.Table:
        uniq, starts, times, ids = ray.get(lookup_ref)
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy()
        uids = batch["user_id"].to_numpy()
        # floor(x*100 + 0.5) — see _running_total_partition's note on
        # round-half-mode ambiguity
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        n = len(uids)
        lo = np.zeros(n, dtype=np.int64)
        hi = np.zeros(n, dtype=np.int64)
        for uid in np.unique(uids):
            pos = int(np.searchsorted(uniq, uid))
            if pos >= len(uniq) or uniq[pos] != uid:
                continue
            s, e = int(starts[pos]), int(starts[pos + 1])
            d = times[s:e]
            sel = uids == uid
            lo[sel] = s + np.searchsorted(
                d, ts[sel] - window_us, side="right"
            )
            hi[sel] = s + np.searchsorted(d, ts[sel], side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return pa.table(
                {
                    "anchor_id": pa.array([], pa.int64()),
                    "n_follow": pa.array([], pa.int64()),
                    "value_cents": pa.array([], pa.int64()),
                }
            )
        rep = np.repeat(np.arange(n), counts)
        cum = np.cumsum(counts) - counts
        flat = (np.arange(total) - cum[rep]) + lo[rep]
        t = pa.table(
            {
                "anchor_id": pa.array(ids[flat], pa.int64()),
                "n_follow": pa.array(
                    np.ones(total, dtype=np.int64), pa.int64()
                ),
                "value_cents": pa.array(cents[rep], pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, "anchor_id", use_threads=False).aggregate(
            [("n_follow", "sum"), ("value_cents", "sum")]
        )
        return pa.table(
            {
                "anchor_id": g["anchor_id"],
                "n_follow": g["n_follow_sum"],
                "value_cents": g["value_cents_sum"],
            }
        )

    return partials


# ----------------------------------------------------------- pagerank

PAGERANK_SCALE = 1_000_000
PAGERANK_ITERS = 3
# Driver/broadcast budget for the node table: (node, outdeg, rank) is
# 24 bytes/node, so 128 MiB covers ~5.6M nodes. Beyond it the dense
# driver-merged reduce would OOM the driver, so pagerank() switches to
# the hash-partitioned all-to-all path — same integer semantics,
# shuffle cost (mirrors the measured-budget regimes in dedup.py).
PAGERANK_NODE_BUDGET_BYTES = 128 << 20
_PR_PARTS = 64


def _pagerank_distributed(
    edges: ray.data.Dataset, iters: int
) -> ray.data.Dataset:
    """Beyond-broadcast PageRank: the node state (node, outdeg, rank)
    stays a hash-partitioned Dataset; each iteration is two bounded
    ``groupby(part)`` exchanges (co-group contrib with edges on src,
    then merge per-dst inflow partials back onto the node state).
    Bit-identical to the dense path — every op is positive-operand
    integer arithmetic, so partial-sum order can't change the result
    (pinned by tests/test_relational.py's path-equality test)."""

    def edge_rows(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy()
        return pa.table(
            {
                "key": batch["src"],
                "kind": pa.array(np.ones(len(src), np.int64)),
                "v1": batch["dst"],
                "part": pa.array(src & (_PR_PARTS - 1), pa.int64()),
            }
        )

    # one materialization; re-read every iteration's co-group
    edges_keyed = edges.map_batches(
        edge_rows, batch_format="pyarrow"
    ).materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            batch["src"].to_numpy(), return_counts=True
        )
        return pa.table(
            {
                "node": pa.array(vals, pa.int64()),
                "outdeg": pa.array(counts, pa.int64()),
                "part": pa.array(vals & (_PR_PARTS - 1), pa.int64()),
            }
        )

    def deg_merge(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("node", sort=True)["outdeg"].sum()
        nodes = g.index.to_numpy()
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "outdeg": pa.array(g.to_numpy(), pa.int64()),
                "rank": pa.array(
                    np.full(len(nodes), PAGERANK_SCALE), pa.int64()
                ),
                "part": pa.array(nodes & (_PR_PARTS - 1), pa.int64()),
            }
        )

    state = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(deg_merge, batch_format="pandas")
        .materialize()
    )
    base = (15 * PAGERANK_SCALE) // 100

    def contrib_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["node"],
                "kind": pa.array(
                    np.zeros(batch.num_rows, np.int64)
                ),
                "v1": pa.array(
                    batch["rank"].to_numpy()
                    // batch["outdeg"].to_numpy(),
                    pa.int64(),
                ),
                "part": batch["part"],
            }
        )

    def flow_group(df: pd.DataFrame) -> pa.Table:
        # kind 0: (node, contrib); kind 1: (src, dst) — co-located by
        # hash(src). Emit per-dst inflow PARTIALS (kind 1, keyed for
        # the next exchange by hash(dst)).
        kind = df["kind"].to_numpy()
        k0, k1 = df[kind == 0], df[kind == 1]
        nodes = k0["key"].to_numpy()
        order = np.argsort(nodes, kind="mergesort")
        nodes, contrib = nodes[order], k0["v1"].to_numpy()[order]
        dst = k1["v1"].to_numpy()
        c = contrib[np.searchsorted(nodes, k1["key"].to_numpy())]
        ud, inv = np.unique(dst, return_inverse=True)
        flow = np.zeros(len(ud), dtype=np.int64)
        np.add.at(flow, inv, c)
        return pa.table(
            {
                "key": pa.array(ud, pa.int64()),
                "kind": pa.array(np.ones(len(ud), np.int64)),
                "v1": pa.array(flow, pa.int64()),
                "part": pa.array(ud & (_PR_PARTS - 1), pa.int64()),
            }
        )

    def state_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["node"],
                "kind": pa.array(np.zeros(batch.num_rows, np.int64)),
                "v1": batch["outdeg"],
                "part": batch["part"],
            }
        )

    def rank_group(df: pd.DataFrame) -> pa.Table:
        # kind 0: (node, outdeg); kind 1: per-dst inflow partials.
        kind = df["kind"].to_numpy()
        k0, k1 = df[kind == 0], df[kind == 1]
        nodes = k0["key"].to_numpy()
        order = np.argsort(nodes, kind="mergesort")
        nodes, outdeg = nodes[order], k0["v1"].to_numpy()[order]
        inflow = np.zeros(len(nodes), dtype=np.int64)
        if len(k1):
            np.add.at(
                inflow,
                np.searchsorted(nodes, k1["key"].to_numpy()),
                k1["v1"].to_numpy(),
            )
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "outdeg": pa.array(outdeg, pa.int64()),
                "rank": pa.array(
                    base + (85 * inflow) // 100, pa.int64()
                ),
                "part": pa.array(nodes & (_PR_PARTS - 1), pa.int64()),
            }
        )

    for _ in range(iters):
        flows = (
            state.map_batches(contrib_rows, batch_format="pyarrow")
            .union(edges_keyed)
            .groupby("part")
            .map_groups(flow_group, batch_format="pandas")
        )
        state = (
            state.map_batches(state_rows, batch_format="pyarrow")
            .union(flows)
            .groupby("part")
            .map_groups(rank_group, batch_format="pandas")
            .materialize()
        )
    return state.select_columns(["node", "rank"])


def pagerank(
    edges: ray.data.Dataset,
    iters: int = PAGERANK_ITERS,
    node_budget_bytes: int = PAGERANK_NODE_BUDGET_BYTES,
):
    """Integer PageRank over a symmetric edge Dataset (src, dst):
    rank' = (15*SCALE)//100 + (85 * sum(rank[src] // outdeg[src])) // 100.

    Every operation is positive-operand integer arithmetic, so the
    result is bit-identical across any execution order (and to the
    unrolled SQL oracle) — no float damping factor to drift.

    Distribution shape: the EDGE set streams; the NODE table (node,
    outdeg, rank) is the reduced side. Its size is MEASURED before the
    driver ever collects it: the per-block degree-partial row count is
    an upper bound on the distinct-node count, and if 24 bytes x that
    bound exceeds ``node_budget_bytes`` the computation switches to
    ``_pagerank_distributed`` (hash-partitioned groupby exchanges, same
    integer semantics, all-to-all cost — and a Dataset result, since a
    beyond-budget node table must not land on the driver). Within
    budget, the fast path runs: per iteration each edge block reduces
    to ONE dense int64 inflow vector over the node universe (8 bytes x
    nodes per block) and the driver sums those vectors — integer
    addition commutes, so this is exact — replacing a nodes-sized
    all-to-all ``groupby(dst)`` per iteration with a blocks-sized
    ``take_all`` (measured 4 s/iter -> ~0.3 s/iter at sf0.1). Degree
    counting uses the same dense per-block reduce.

    Returns (node, rank): a small driver-side Arrow table on the dense
    path, a Dataset on the distributed path.
    """
    edges = edges.materialize()  # consumed once per iteration + degree

    # node universe + outdegree: per-block (unique src, count) partials
    # merged driver-side (node-regime table, vectorized pandas merge)
    def deg_partial(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            batch["src"].to_numpy(), return_counts=True
        )
        return pa.table(
            {
                "src": pa.array(vals, pa.int64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    deg_partials = edges.map_batches(
        deg_partial, batch_format="pyarrow"
    ).materialize()
    # partial rows >= distinct nodes (each block lists its unique
    # srcs), so this gate is conservative: it can only overestimate
    # the node table, never under-admit it to the driver
    if deg_partials.count() * 24 > node_budget_bytes:
        return _pagerank_distributed(edges, iters)

    deg = (
        deg_partials.to_pandas()
        .groupby("src", sort=True)["n"]
        .sum()
    )
    nodes = deg.index.to_numpy().astype(np.int64)
    outdeg = deg.to_numpy().astype(np.int64)
    rank = np.full(len(nodes), PAGERANK_SCALE, dtype=np.int64)
    base = (15 * PAGERANK_SCALE) // 100

    for _ in range(iters):
        state_ref = ray.put((nodes, rank // outdeg))

        def flow(batch: pa.Table) -> pa.Table:
            nds, contrib = ray.get(state_ref)
            src = batch["src"].to_numpy()
            dst = batch["dst"].to_numpy()
            dense = np.zeros(len(nds), dtype=np.int64)
            np.add.at(
                dense,
                np.searchsorted(nds, dst),
                contrib[np.searchsorted(nds, src)],
            )
            return pa.table(
                {"inflow": pa.array([dense.tobytes()], pa.large_binary())}
            )

        inflow = np.zeros(len(nodes), dtype=np.int64)
        for r in edges.map_batches(
            flow, batch_format="pyarrow"
        ).take_all():
            inflow += np.frombuffer(r["inflow"], dtype=np.int64)
        rank = base + (85 * inflow) // 100

    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "rank": pa.array(rank, pa.int64()),
        }
    )


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
    def _with_part(src, dst, label):
        return pa.table(
            {
                "src": src,
                "dst": dst,
                "label": label,
                "src_part": pc.cast(
                    pc.bit_wise_and(src, pa.scalar(63, pa.int64())),
                    pa.int32(),
                ),
            }
        )

    both_dirs = edges.map_batches(
        lambda b: _with_part(
            pa.concat_arrays(
                [b["doc_a"].combine_chunks(), b["doc_b"].combine_chunks()]
            ),
            pa.concat_arrays(
                [b["doc_b"].combine_chunks(), b["doc_a"].combine_chunks()]
            ),
            pa.nulls(2 * b.num_rows, pa.int64()),
        ),
        batch_format="pyarrow",
    ).materialize()

    def propagate_partition(df: pd.DataFrame) -> pd.DataFrame:
        """One hash-PARTITION of co-grouped rows (complete src groups —
        same src → same partition): forward each src's label to all its
        dsts in ONE vectorized map. A per-src pandas group would pay
        per-group overhead on millions of tiny groups (the cliff the
        user-window ops dodge with user_part)."""
        lbl = df[df["dst"] < 0]
        edges = df[df["dst"] >= 0]
        if lbl.empty or edges.empty:
            return pd.DataFrame({"node": [], "label": []}).astype(
                {"node": "int64", "label": "int64"}
            )
        # labels carry one row per node (they come from a per-node
        # min), so a plain index map suffices
        m = lbl.set_index("src")["label"]
        lab = edges["src"].map(m)
        ok = lab.notna()
        return pd.DataFrame(
            {
                "node": edges.loc[ok, "dst"].astype("int64").to_numpy(),
                "label": lab[ok].astype("int64").to_numpy(),
            }
        )

    for _ in range(max_iters):
        tagged_labels = labels.map_batches(
            lambda t: _with_part(
                t["node"].combine_chunks(),
                pa.nulls(t.num_rows, pa.int64()).fill_null(-1),
                t["label"].combine_chunks(),
            ),
            batch_format="pyarrow",
        )
        msgs = (
            both_dirs.union(tagged_labels)
            # BOUNDED partitions (src & 63), not one pandas group per
            # node — complete src groups land together, the forward is
            # one vectorized map per partition
            .groupby("src_part")
            .map_groups(propagate_partition, batch_format="pandas")
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


# ---------------------------------------------- budgeted anti-filter

# Driver-side byte budget for broadcasting a drop-id set; past it the
# filter degrades to a hash-partitioned left_anti Dataset.join with no
# driver state at all. 64 MiB ≈ 8M int64 ids — far above any test
# corpus, far below driver RAM.
ANTI_FILTER_BUDGET_BYTES = 64 << 20


def anti_filter(
    ds: ray.data.Dataset,
    drop: ray.data.Dataset,
    key: str,
    byte_budget: int | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Drop every ``ds`` row whose ``key`` appears in ``drop`` (a
    skinny id Dataset assembled off-driver).

    Two regimes, identical output (pytest-pinned):

    * **broadcast** — the drop ids stream to the driver while they fit
      ``byte_budget``, ship once via ``ray.put``, and the pass is
      map-only (the dedup/droplist shape used across the engine).
    * **join** — past the budget the ids never reach the driver: a
      hash-partitioned ``left_anti`` ``Dataset.join`` on ``key``.
      This is the regime a duplicate-saturated corpus at 10^12 docs
      lands in, where the loser set itself is terabytes.
    """
    import pyarrow.compute as pc

    from ..functions.broadcast import cached_get

    if byte_budget is None:
        # resolved at call time so operators can retune the module
        # constant (the escape hatch corpus_export's guard points at)
        byte_budget = ANTI_FILTER_BUDGET_BYTES
    drop = drop.materialize()  # reused by whichever regime runs
    tables, total = [], 0
    over_budget = False
    for ref in drop.to_arrow_refs():
        t = ray.get(ref)
        if not t.num_rows:
            continue
        t = t.select([key])
        tables.append(t)
        # budget what would actually broadcast: the key column only
        total += t.nbytes
        if total > byte_budget:
            over_budget = True
            break
    if over_budget:
        if num_partitions is None:
            num_partitions = max(
                8, int(ray.cluster_resources().get("CPU", 8)) // 4
            )
        return ds.join(
            drop,
            join_type="left_anti",
            num_partitions=num_partitions,
            on=(key,),
        )
    if not tables:
        return ds
    ids = pa.concat_tables(tables)[key].combine_chunks()
    ids_ref = ray.put(ids)

    def keep(batch: pa.Table) -> pa.Table:
        d = cached_get(ids_ref)
        return batch.filter(pc.invert(pc.is_in(batch[key], value_set=d)))

    return ds.map_batches(keep, batch_format="pyarrow")
