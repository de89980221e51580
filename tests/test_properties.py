"""Property-based tests (SURVEY.md §5.4): engine aggregates vs a pandas
oracle on randomly generated inputs, and structural top-k invariants.

max_examples is kept small — every example runs real Spark jobs."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from etl_platform_nyc_taxi_spark.operators.windows import top_k_by_count
from etl_platform_nyc_taxi_spark.plans.daily_transactions import daily_counts

_TS = st.one_of(
    st.none(),
    st.datetimes(
        min_value=dt.datetime(2024, 1, 1),
        max_value=dt.datetime(2024, 1, 20),
    ),
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(ts_list=st.lists(_TS, min_size=0, max_size=60))
@settings(**_SETTINGS)
def test_daily_counts_match_pandas(spark, ts_list):
    df = spark.createDataFrame([(t,) for t in ts_list], "ts timestamp")
    got = {
        r["transaction_date"]: r["total_transactions"]
        for r in daily_counts(df, ts_col="ts").collect()
    }
    s = pd.Series([t for t in ts_list if t is not None], dtype="datetime64[us]")
    want = s.dt.date.value_counts().to_dict()
    assert got == want


@given(keys=st.lists(st.integers(min_value=0, max_value=8), min_size=1, max_size=80))
@settings(**_SETTINGS)
def test_topk_invariants(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "zone long")
    out = top_k_by_count(df, key="zone", k=3).collect()
    counts = pd.Series(keys).value_counts().to_dict()
    got = {r["zone"]: (r["cnt"], r["rank"]) for r in out}
    # 1. reported counts are exact
    assert all(counts[z] == c for z, (c, _) in got.items())
    # 2. ranks are dense from 1 and non-increasing in count
    by_rank = sorted(got.values(), key=lambda cr: cr[1])
    assert [r for _, r in by_rank][0] == 1
    assert set(r for _, r in by_rank) == set(range(1, max(r for _, r in by_rank) + 1))
    assert all(
        by_rank[i][0] >= by_rank[i + 1][0] for i in range(len(by_rank) - 1)
    )
    # 3. dense_rank tie semantics: every key whose count ties an included
    # key is also included, and every excluded key counts strictly less
    included_min = min(c for c, _ in got.values())
    for z, c in counts.items():
        if c > included_min:
            assert z in got
        if z not in got:
            assert c < included_min


@given(
    weights=st.lists(
        st.integers(min_value=1, max_value=50), min_size=1, max_size=60
    ),
    k=st.integers(min_value=1, max_value=8),
)
@settings(**_SETTINGS)
def test_pps_systematic_invariants(spark, weights, k):
    """Systematic PPS: 1..k picks per key; certainty items (w > W/k)
    always selected; selection is a pure function of (ids, weights, k)."""
    from etl_platform_nyc_taxi_spark.operators.sampling import (
        pps_systematic_per_key,
    )

    rows_in = [("g", i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows_in, "key string, rid long, w long")
    picked = sorted(
        r["rid"]
        for r in pps_systematic_per_key(df, ["key"], "rid", "w", k).collect()
    )
    assert 1 <= len(picked) <= k
    total = sum(weights)
    for i, w in enumerate(weights):
        if w * k > total:  # strictly more than one stride: must be picked
            assert i in picked
    # determinism under repartitioning
    again = sorted(
        r["rid"]
        for r in pps_systematic_per_key(
            df.repartition(7), ["key"], "rid", "w", k
        ).collect()
    )
    assert picked == again


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=30,
    ),
    max_hops=st.integers(min_value=0, max_value=4),
)
@settings(**_SETTINGS)
def test_bfs_distances_match_networkx_free_oracle(spark, edges, max_hops):
    """BFS vs a pure-python BFS oracle on random small graphs: same
    reachable set and exact distances at every cutoff."""
    from etl_platform_nyc_taxi_spark.operators.graph import bfs_distances

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    src_node = min(min(a, b) for a, b in edges)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {src_node: 0}
    frontier = [src_node]
    for hop in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in want:
                    want[v] = hop
                    nxt.append(v)
        frontier = nxt
    edf = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(src_node,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edf, sdf, max_hops=max_hops).collect()
    }
    assert got == want


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=60,
    ),
    window=st.integers(min_value=1, max_value=5),
)
@settings(**_SETTINGS)
def test_rolling_distinct_matches_bruteforce_property(spark, pairs, window):
    from etl_platform_nyc_taxi_spark.operators.analytics import rolling_distinct

    base = dt.date(2024, 2, 1)
    data = [(u, base + dt.timedelta(days=d)) for u, d in pairs]
    df = spark.createDataFrame(data, "user_id long, day date")
    got = {
        r["window_day"]: r["n"]
        for r in rolling_distinct(df, "user_id", "day", window, "n").collect()
    }
    days = sorted({d for _, d in data})
    want = {
        wd: len(
            {u for u, d in data if wd - dt.timedelta(days=window - 1) <= d <= wd}
        )
        for wd in days
    }
    assert got == want


@given(
    values=st.lists(
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
        min_size=1,
        max_size=80,
    )
)
@settings(**_SETTINGS)
def test_sketch_quantile_bounds_property(spark, values):
    """Sketch quantile reads must be the lower edge of the bin holding
    the exact rank-selected quantile: q_hat <= q_exact < q_hat + 1/scale,
    for any data distribution."""
    import math

    from etl_platform_nyc_taxi_spark.operators.analytics import (
        binned_sketch,
        sketch_quantiles,
    )

    df = spark.createDataFrame([("g", v) for v in values], "grp string, value double")
    sk = binned_sketch(df, "value", ["grp"], scale=16)
    row = sketch_quantiles(sk, ["grp"], [0.5, 0.95], scale=16).collect()[0]
    vals = sorted(values)
    n = len(vals)
    assert row["n_events"] == n
    for q, col in ((0.5, "p50"), (0.95, "p95")):
        exact = vals[math.ceil(q * n) - 1]
        assert row[col] == math.floor(exact * 16) / 16.0
        assert row[col] <= exact < row[col] + 1 / 16.0
