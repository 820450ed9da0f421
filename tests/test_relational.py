"""Relational / stream-shaped operators: sessionization boundaries,
as-of join edges, near-dup clustering transitivity, hash join."""

from datetime import datetime, timedelta

import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from pdf_to_text_ray.stages import relational


def _events(rows):
    return pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts"]
    ).astype({"event_id": "int64", "user_id": "int64"})


T0 = datetime(2026, 1, 1, 12, 0, 0)


def test_sessionize_splits_on_gap():
    df = _events(
        [
            (1, 7, T0),
            (2, 7, T0 + timedelta(minutes=10)),
            (3, 7, T0 + timedelta(minutes=29)),   # still session 0 vs prev
            (4, 7, T0 + timedelta(minutes=75)),   # 46-min gap -> session 1
            (5, 7, T0 + timedelta(minutes=80)),
        ]
    )
    out = relational._sessionize_partition(df)
    assert out["session_id"].tolist() == [0, 1]
    assert out["n_events"].tolist() == [3, 2]
    assert out["start_ts"].tolist() == [T0, T0 + timedelta(minutes=75)]
    assert out["end_ts"].tolist() == [
        T0 + timedelta(minutes=29), T0 + timedelta(minutes=80)
    ]


def test_sessionize_exact_gap_is_same_session():
    df = _events([(1, 7, T0), (2, 7, T0 + timedelta(minutes=30))])
    out = relational._sessionize_partition(df)
    assert out["session_id"].tolist() == [0]  # strict > gap splits


def test_sessionize_partition_user_boundary_always_splits():
    # two users co-resident in one hash partition: user 8's first event
    # is < gap after user 7's last — a session must still start, and
    # user 8's session_id restarts at 0
    df = _events(
        [
            (1, 7, T0),
            (2, 7, T0 + timedelta(minutes=40)),   # user 7 session 1
            (3, 8, T0 + timedelta(minutes=41)),   # new user -> session 0
            (4, 8, T0 + timedelta(minutes=45)),
        ]
    )
    out = relational._sessionize_partition(df).sort_values(
        ["user_id", "session_id"]
    )
    assert list(zip(out["user_id"], out["session_id"], out["n_events"])) == [
        (7, 0, 1), (7, 1, 1), (8, 0, 2)
    ]


def test_funnel_partition_vectorized_semantics():
    rows = [
        # user 1: purchase before signup doesn't count; one after does
        (1, "purchase", T0 - timedelta(hours=1)),
        (1, "signup", T0),
        (1, "purchase", T0 + timedelta(hours=2)),
        (1, "purchase", T0 + timedelta(hours=5)),  # not first
        # user 2: signup, never purchases
        (2, "signup", T0 + timedelta(minutes=3)),
        # user 3: purchase only (no signup) -> excluded entirely
        (3, "purchase", T0),
        # user 4: purchase at EXACTLY signup ts counts (>=)
        (4, "signup", T0),
        (4, "purchase", T0),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"]).astype(
        {"user_id": "int64"}
    )
    out = relational._funnel_partition(df).to_pandas().set_index("user_id")
    us = int(T0.timestamp() * 1_000_000)
    assert sorted(out.index) == [1, 2, 4]
    assert bool(out.loc[1, "converted"]) is True
    assert int(out.loc[1, "purchase_ts_us"]) == us + 2 * 3600 * 1_000_000
    assert bool(out.loc[2, "converted"]) is False
    assert pd.isna(out.loc[2, "purchase_ts_us"])
    assert int(out.loc[4, "purchase_ts_us"]) == us


def test_asof_join_edges():
    orders = pa.table(
        {
            "o_custkey": pa.array([7, 7, 8], pa.int64()),
            "o_orderdate": pa.array(
                [T0, T0 + timedelta(days=5), T0 + timedelta(days=1)],
                pa.timestamp("us"),
            ),
        }
    )
    lookup_ref = ray.put(relational.make_asof_lookup(orders))
    batch = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([7, 7, 8, 99], pa.int64()),
            "ts": pa.array(
                [
                    T0 - timedelta(days=1),       # before first order -> null
                    T0 + timedelta(days=9),       # after both -> day-5 order
                    T0 + timedelta(days=1),       # exact match ts==date
                    T0,                           # unknown user -> null
                ],
                pa.timestamp("us"),
            ),
        }
    )
    out = relational.make_asof_join(lookup_ref)(batch).to_pylist()
    assert out[0]["last_order_date"] is None
    assert out[1]["last_order_date"] == T0 + timedelta(days=5)
    assert out[2]["last_order_date"] == T0 + timedelta(days=1)
    assert out[3]["last_order_date"] is None


def test_range_join_partials_match_bruteforce():
    """Vectorized interval-probe partials == per-pair python brute
    force: window edges ([anchor, anchor+W) half-open), overlapping
    windows of one user, unknown users, and integer-cents sums."""
    import random

    rng = random.Random(7)
    w_us = relational.RANGE_JOIN_WINDOW_US
    a_users = [rng.randint(1, 5) for _ in range(12)]
    a_ts = [rng.randint(0, 4 * w_us) for _ in range(12)]
    a_ids = list(range(100, 112))
    lookup_ref = ray.put(
        relational.make_range_lookup(a_users, a_ts, a_ids)
    )
    n = 60
    uids = [rng.randint(1, 6) for _ in range(n)]  # 6 = unknown user
    ts = [rng.randint(-w_us, 5 * w_us) for _ in range(n)]
    vals = [round(rng.uniform(0, 50), 2) for _ in range(n)]
    batch = pa.table(
        {
            "user_id": pa.array(uids, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array(vals, pa.float64()),
        }
    )
    got = (
        relational.make_range_join_partials(lookup_ref)(batch)
        .to_pandas()
        .set_index("anchor_id")
        .sort_index()
    )
    exp: dict[int, list[int]] = {}
    for au, at, aid in zip(a_users, a_ts, a_ids):
        for u, t, v in zip(uids, ts, vals):
            if u == au and at <= t < at + w_us:
                c, s = exp.setdefault(aid, [0, 0])
                exp[aid] = [c + 1, s + int(round(v * 100))]
    assert sorted(got.index) == sorted(exp)
    for aid, (c, s) in exp.items():
        assert got.loc[aid, "n_follow"] == c
        assert got.loc[aid, "value_cents"] == s


def test_cluster_pairs_transitive():
    clusters = relational.cluster_pairs([(5, 9), (9, 2), (11, 12)])
    assert clusters[5] == clusters[9] == clusters[2] == 2
    assert clusters[11] == clusters[12] == 11


def test_hash_join_matches_pandas(sf_dir):
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    got = {
        r["c_mktsegment"]: r["n_orders"]
        for r in relational.orders_by_segment(orders, customer).take_all()
    }
    import pyarrow.parquet as pq

    o = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    c = pq.read_table(f"{sf_dir}/customer.parquet").to_pandas()
    want = (
        o.merge(c, left_on="o_custkey", right_on="c_custkey")
        .groupby("c_mktsegment")
        .size()
        .to_dict()
    )
    assert got == want


def test_cluster_pairs_distributed_matches_unionfind():
    import pyarrow as pa

    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, isolated pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([a for a, _ in edges], pa.int64()),
                "doc_b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in relational.cluster_pairs_distributed(ds).take_all()
    }
    want = relational.cluster_pairs(edges)
    assert got == want
    assert got[4] == 1 and got[12] == 10 and got[21] == 20


def test_distributed_clusters_match_unionfind_on_corpus(sf_dir):
    """The QUERIES entry runs the distributed path; driver union-find
    over the same verified pairs is the oracle."""
    from pdf_to_text_ray.pipelines.queries import (
        q_dup_clusters,
        q_minhash_near_dups,
    )

    got = {
        r["doc_id"]: r["cluster_id"] for r in q_dup_clusters(sf_dir).take_all()
    }
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in q_minhash_near_dups(sf_dir).take_all()
    ]
    want = relational.cluster_pairs(pairs)
    assert got == want and got


def test_fuzzy_dedup_keeps_cluster_representatives(sf_dir):
    """fuzzy_dedup drops exactly the non-representative members of
    every near-dup cluster and nothing else."""
    import pyarrow.parquet as pq

    from pdf_to_text_ray.pipelines.queries import q_dup_clusters, q_fuzzy_dedup

    clusters = {
        r["doc_id"]: r["cluster_id"] for r in q_dup_clusters(sf_dir).take_all()
    }
    losers = {d for d, c in clusters.items() if d != c}
    all_ids = set(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_pylist()
    )
    kept = {r["doc_id"] for r in q_fuzzy_dedup(sf_dir).take_all()}
    assert kept == all_ids - losers
    assert losers and losers.isdisjoint(kept)


def test_anti_filter_regimes_agree():
    """Broadcast and left_anti-join regimes of relational.anti_filter
    produce the identical surviving row set."""
    import pyarrow as pa
    import ray
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(100)), pa.int64()),
                "n": pa.array([i * 2 for i in range(100)], pa.int64()),
            }
        )
    )
    drop = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([3, 7, 7, 50, 99], pa.int64())})
    )
    bc = {
        (r["doc_id"], r["n"])
        for r in relational.anti_filter(ds, drop, "doc_id").take_all()
    }
    jn = {
        (r["doc_id"], r["n"])
        for r in relational.anti_filter(
            ds, drop, "doc_id", byte_budget=1
        ).take_all()
    }
    assert bc == jn
    assert len(bc) == 96  # 100 minus {3, 7, 50, 99}
    assert all(i not in {3, 7, 50, 99} for i, _ in bc)


def test_fuzzy_dedup_join_regime_matches_broadcast(sf_dir, monkeypatch):
    """q_fuzzy_dedup itself, forced into the left_anti join regime via
    the module budget constant (resolved at CALL time), returns the
    identical survivor set as the default broadcast regime."""
    from pdf_to_text_ray.pipelines import queries as Q

    base = {r["doc_id"] for r in Q.q_fuzzy_dedup(sf_dir).take_all()}
    monkeypatch.setattr(relational, "ANTI_FILTER_BUDGET_BYTES", 1)
    joined = {r["doc_id"] for r in Q.q_fuzzy_dedup(sf_dir).take_all()}
    assert joined == base and joined


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_anti_filter_regimes_agree_randomized(seed):
    import random

    import pyarrow as pa
    import ray.data

    rng = random.Random(seed)
    n = rng.randint(1, 200)
    ids = rng.sample(range(1000), n)
    drops = [rng.choice(range(1000)) for _ in range(rng.randint(0, 50))]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64())})
    )
    drop = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(drops, pa.int64())})
    )
    want = {i for i in ids if i not in set(drops)}
    bc = {
        r["doc_id"]
        for r in relational.anti_filter(ds, drop, "doc_id").take_all()
    }
    jn = {
        r["doc_id"]
        for r in relational.anti_filter(
            ds, drop, "doc_id", byte_budget=1
        ).take_all()
    }
    assert bc == want and jn == want


def test_pagerank_hand_computed_and_layout_invariant():
    """3-node path graph, 3 integer iterations, checked against the
    hand-computed fixed arithmetic; identical under any block layout
    (dense partials are exact integer sums)."""
    edges_tbl = pa.table(
        {
            "src": pa.array([1, 2, 2, 3], pa.int64()),
            "dst": pa.array([2, 1, 3, 2], pa.int64()),
        }
    )
    out = {
        r["node"]: r["rank"]
        for r in relational.pagerank(
            ray.data.from_arrow(edges_tbl)
        ).to_pylist()
    }
    # iter1: ranks (575000, 1850000, 575000); iter2: (936250, 1127500,
    # 936250); iter3: (629187, 1741625, 629187)
    assert out == {1: 629187, 2: 1741625, 3: 629187}
    out13 = {
        r["node"]: r["rank"]
        for r in relational.pagerank(
            ray.data.from_arrow(edges_tbl).repartition(4)
        ).to_pylist()
    }
    assert out13 == out


def test_range_join_empty_anchor_side_yields_no_matches():
    """No anchors (e.g. zero signup events) -> empty partials, like
    the SQL inner join — not an IndexError."""
    lookup_ref = ray.put(relational.make_range_lookup([], [], []))
    batch = pa.table(
        {
            "user_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([T0, T0], pa.timestamp("us")),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    out = relational.make_range_join_partials(lookup_ref)(batch)
    assert out.num_rows == 0


def test_running_total_exact_half_cent_rounds_up():
    """floor(x*100 + 0.5): the exact .5-cent tie (0.125*100 = 12.5,
    representable) goes UP in both engines — np.round's half-to-even
    would give 12 while DuckDB round() gives 13."""
    df = pd.DataFrame(
        {
            "event_id": pd.array([1], "int64"),
            "user_id": pd.array([7], "int64"),
            "ts": pd.Series([T0]),
            "value": [0.125],
        }
    )
    out = relational._running_total_partition(df)
    assert out["running_cents"].tolist() == [13]


def _random_symmetric_edges(seed: int, n_nodes: int = 40, n_edges: int = 120):
    import random

    import numpy as np

    rng = random.Random(seed)
    pairs = set()
    while len(pairs) < n_edges:
        a, b = rng.randint(1, n_nodes), rng.randint(1, n_nodes)
        if a != b:
            pairs.add((a, b))
            pairs.add((b, a))
    src, dst = map(np.int64, zip(*sorted(pairs)))
    return pa.table(
        {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
    )


@pytest.mark.parametrize("seed", [3, 17])
def test_pagerank_distributed_path_matches_dense(seed):
    """The beyond-budget hash-partitioned path must be bit-identical to
    the dense driver-merged path (integer arithmetic commutes), on a
    random symmetric graph and under different block layouts."""
    tbl = _random_symmetric_edges(seed)
    dense = {
        r["node"]: r["rank"]
        for r in relational.pagerank(ray.data.from_arrow(tbl)).to_pylist()
    }
    dist = {
        r["node"]: r["rank"]
        for r in relational._pagerank_distributed(
            ray.data.from_arrow(tbl).repartition(5), relational.PAGERANK_ITERS
        ).take_all()
    }
    assert dist == dense


def test_pagerank_budget_gate_switches_to_distributed():
    """node_budget_bytes=0 must route through the distributed path — a
    Dataset result, never a driver-side node table — with the same
    values; the default budget keeps the dense Arrow-table fast path."""
    tbl = _random_symmetric_edges(7)
    gated = relational.pagerank(
        ray.data.from_arrow(tbl), node_budget_bytes=0
    )
    assert isinstance(gated, ray.data.Dataset)
    dense = relational.pagerank(ray.data.from_arrow(tbl))
    assert isinstance(dense, pa.Table)
    assert {
        (r["node"], r["rank"]) for r in gated.take_all()
    } == set(zip(dense["node"].to_pylist(), dense["rank"].to_pylist()))


@pytest.mark.parametrize("seed", [5, 23, 77])
def test_pareto_keep_matches_bruteforce(seed):
    """Suffix-max skyline mask == O(n^2) dominance definition, on a
    small grid with heavy ties (duplicate frontier points must ALL
    survive: neither dominates the other)."""
    import random

    import numpy as np

    rng = random.Random(seed)
    n = 120
    x = np.array([rng.randint(0, 8) for _ in range(n)], dtype=np.int64)
    y = np.array([rng.randint(0, 8) for _ in range(n)], dtype=np.int64)
    got = relational.pareto_keep(x, y)
    for i in range(n):
        dominated = any(
            x[j] >= x[i] and y[j] >= y[i] and (x[j] > x[i] or y[j] > y[i])
            for j in range(n)
        )
        assert got[i] == (not dominated), (i, x[i], y[i])


def test_coverage_partition_hand_computed():
    """Two users: overlapping windows merge, touching windows merge
    (strict-gap break), a gap opens a second island."""
    w_min = relational.INTERVAL_COVERAGE_WINDOW_US // 60_000_000
    df = _events(
        [
            (1, 7, T0),
            (2, 7, T0 + timedelta(minutes=5)),        # overlaps -> merge
            (3, 7, T0 + timedelta(minutes=w_min + 5)),  # touches e2's end
            (4, 7, T0 + timedelta(minutes=3 * w_min)),  # gap -> island 2
            (5, 8, T0),                                 # other user
        ]
    )
    out = (
        relational._coverage_partition(df)
        .set_index("user_id")["covered_us"]
        .to_dict()
    )
    w_us = relational.INTERVAL_COVERAGE_WINDOW_US
    # user 7 island 1: [0, (w+5)+w) = 2w+5min; island 2: w
    assert out[7] == (2 * w_us + 5 * 60_000_000) + w_us
    assert out[8] == w_us


def test_running_distinct_partition_hand_computed():
    rows = [
        (1, 7, "view", T0),
        (2, 7, "view", T0 + timedelta(minutes=1)),
        (3, 7, "click", T0 + timedelta(minutes=2)),
        (4, 8, "view", T0 + timedelta(minutes=3)),  # new user restarts
        (5, 7, "view", T0 + timedelta(minutes=4)),
    ]
    df = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts"]
    ).astype({"event_id": "int64", "user_id": "int64"})
    out = relational._running_distinct_partition(df).set_index("event_id")
    assert out["n_distinct_types"].to_dict() == {1: 1, 2: 1, 3: 2, 4: 1, 5: 2}


def test_markov_partition_counts_pairs_per_user_only():
    rows = [
        (1, 7, "view", T0),
        (2, 7, "click", T0 + timedelta(minutes=1)),
        (3, 7, "click", T0 + timedelta(minutes=2)),
        (4, 8, "purchase", T0 + timedelta(minutes=3)),  # no cross-user pair
        (5, 8, "view", T0 + timedelta(minutes=4)),
    ]
    df = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts"]
    ).astype({"event_id": "int64", "user_id": "int64"})
    out = relational._markov_partition(df)
    got = {
        (r.from_type, r.to_type): r.n for r in out.itertuples(index=False)
    }
    assert got == {
        ("view", "click"): 1,
        ("click", "click"): 1,
        ("purchase", "view"): 1,
    }


def test_order_priority_semi_regimes_identical(sf_dir):
    """The broadcast-keyset and distributed-join semi-join regimes
    (selected by the measured key-budget gate) must agree exactly."""
    from pdf_to_text_ray.pipelines.queries import q_order_priority_semi

    def rows(**kw):
        return sorted(
            (r["o_orderpriority"], r["n_orders"])
            for r in q_order_priority_semi(sf_dir, **kw).take_all()
        )

    broadcast = rows()
    joined = rows(key_budget_bytes=0)
    assert broadcast == joined
    assert broadcast and sum(n for _, n in broadcast) > 0


def test_large_orders_regimes_identical(sf_dir):
    """Q18-shape having+join: the broadcast-lookup and distributed
    hash-join regimes (measured key-budget gate) must agree exactly."""
    from pdf_to_text_ray.pipelines.queries import q_large_orders

    def rows(**kw):
        return sorted(
            (r["o_orderkey"], r["sum_qty"], r["total_cents"])
            for r in q_large_orders(sf_dir, **kw).take_all()
        )

    broadcast = rows()
    joined = rows(key_budget_bytes=0)
    assert broadcast == joined
    assert broadcast and all(q > 250 for _, q, _c in broadcast)


def test_nation_pair_volume_regimes_identical(sf_dir):
    """Q7-shape fact-fact join: the broadcast order->nation lookup
    and the distributed Dataset.join regimes (metadata-row-count
    budget gate) must agree exactly."""
    from pdf_to_text_ray.pipelines.queries import q_nation_pair_volume

    def rows(**kw):
        t = q_nation_pair_volume(sf_dir, **kw)
        return sorted(
            zip(*(t[c].to_pylist() for c in t.column_names))
        )

    broadcast = rows()
    joined = rows(key_budget_bytes=0)
    assert broadcast == joined
    assert broadcast and all(r[-1] > 0 for r in broadcast)


def test_idle_customers_regimes_identical(sf_dir):
    """Q22-shape scalar-threshold + anti-join: broadcast anti and
    left-outer-join-null regimes must agree exactly."""
    from pdf_to_text_ray.pipelines.queries import q_idle_customers

    def rows(**kw):
        return sorted(
            (r["c_mktsegment"], r["n_cust"], r["bal_cents"])
            for r in q_idle_customers(sf_dir, **kw).take_all()
        )

    broadcast = rows()
    joined = rows(key_budget_bytes=0)
    assert broadcast == joined
    assert broadcast and sum(n for _, n, _b in broadcast) > 0


def test_late_shipment_priority_regimes_identical(sf_dir):
    """Q12-shape fact-fact join: the broadcast-lookup and distributed
    hash-join regimes (measured orders-side byte gate) must agree
    exactly."""
    from pdf_to_text_ray.pipelines.queries import q_late_shipment_priority

    def rows(**kw):
        return sorted(
            (r["l_returnflag"], r["high_line_count"], r["low_line_count"])
            for r in q_late_shipment_priority(sf_dir, **kw).take_all()
        )

    broadcast = rows()
    joined = rows(key_budget_bytes=0)
    assert broadcast == joined
    assert broadcast and sum(h + l for _, h, l in broadcast) > 0


def test_heavy_hitter_candidates_are_superset(sf_dir):
    """The per-block frequent-items pass must never drop a true heavy
    hitter: compare the engine (candidate-restricted recount) against
    an exact full count at several k, including k large enough that
    block-local thresholds get tight."""
    from collections import Counter

    import pyarrow.parquet as pq_

    from pdf_to_text_ray.pipelines.queries import q_heavy_hitter_words

    texts = pq_.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    exact: Counter = Counter()
    for tx in texts:
        exact.update(w for w in tx.lower().split(" ") if w)
    total = sum(exact.values())
    for k in (50, 200, 1000):
        want = sorted(
            (w, n) for w, n in exact.items() if n * k > total
        )
        got = sorted(
            (r["word"], r["n"])
            for r in q_heavy_hitter_words(sf_dir, k=k).take_all()
        )
        assert got == want, f"k={k}: engine != exact"


def test_ewma_partition_matches_sequential_fold():
    """The vectorized weighted-sum unroll must equal the literal
    EWMA recurrence, including 1-event users and cross-user runs."""
    from datetime import datetime, timedelta

    import pandas as pd

    from pdf_to_text_ray.stages.relational import _ewma_partition

    T0 = datetime(2024, 1, 1)
    rows = [
        (1, 7, 3.0, T0),
        (2, 7, 5.0, T0 + timedelta(seconds=1)),
        (3, 7, 9.0, T0 + timedelta(seconds=2)),
        (4, 8, 2.5, T0),                      # single-event user
        (5, 9, 1.0, T0 + timedelta(seconds=5)),
        (6, 9, 4.0, T0 + timedelta(seconds=4)),  # out of order in input
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "value", "ts"])
    df = df.astype({"event_id": "int64", "user_id": "int64"})
    out = _ewma_partition(df).set_index("user_id")["ewma"]

    def fold(vals):
        e = vals[0]
        for v in vals[1:]:
            e = 0.5 * e + 0.5 * v
        return round(e, 6)

    assert out[7] == fold([3.0, 5.0, 9.0])
    assert out[8] == fold([2.5])
    assert out[9] == fold([4.0, 1.0])  # ts order, not input order


def test_last_value_partition_boundaries():
    from datetime import datetime, timedelta

    import pandas as pd

    from pdf_to_text_ray.stages.relational import _last_value_partition

    T0 = datetime(2024, 1, 1)
    rows = [
        (1, 3, 1.0, T0),
        (2, 3, 2.0, T0),                      # ts tie -> event_id breaks
        (3, 4, 7.0, T0 + timedelta(seconds=9)),
        (4, 4, 8.0, T0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "value", "ts"])
    df = df.astype({"event_id": "int64", "user_id": "int64"})
    out = _last_value_partition(df).set_index("user_id")["last_value"]
    assert out[3] == 2.0 and out[4] == 7.0
