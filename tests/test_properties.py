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


# ---------------------------------------------------------------------------
# Substring-dedup family invariants (round 9)
# ---------------------------------------------------------------------------

_WORDS = st.sampled_from(["a", "b", "c", "d", "e", "f"])
_DOC = st.lists(_WORDS, min_size=0, max_size=24).map(" ".join)


def _brute_windows(text: str, w: int) -> list[str]:
    toks = text.split()
    return [" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)]


@given(texts=st.lists(_DOC, min_size=1, max_size=6), w=st.integers(3, 5))
@settings(**_SETTINGS)
def test_exact_substring_pairs_matches_bruteforce(spark, texts, w):
    """Pairs and counts equal a brute-force python recomputation (small
    vocab forces heavy window sharing), and shared_windows can never
    exceed either doc's distinct-window count."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        exact_substring_pairs,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): (r.shared_windows, r.windows_a, r.windows_b)
        for r in exact_substring_pairs(
            df, window=w, max_docs_per_window=100
        ).collect()
    }
    wins = {i: set(_brute_windows(t, w)) for i, t in enumerate(texts)}
    want = {}
    for a in wins:
        for b in wins:
            if a < b and wins[a] & wins[b]:
                want[(a, b)] = (
                    len(wins[a] & wins[b]),
                    len(wins[a]),
                    len(wins[b]),
                )
    assert got == want
    for (a, b), (s, wa, wb) in got.items():
        assert s <= min(wa, wb)


@given(texts=st.lists(_DOC, min_size=1, max_size=6), w=st.integers(3, 5))
@settings(**_SETTINGS)
def test_substring_spans_are_valid_and_disjoint(spark, texts, w):
    """Structural invariants of the removal plan: spans lie inside their
    doc's token range, never overlap within a doc, each is at least one
    window long, and the minimum-id doc of any shared window is never
    marked (owner keeps its copy)."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        substring_dedup_spans,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = substring_dedup_spans(df, window=w).collect()
    ntok = {i: len(t.split()) for i, t in enumerate(texts)}
    wins = {i: set(_brute_windows(t, w)) for i, t in enumerate(texts)}
    owners = {}
    for i, ws in wins.items():
        for x in ws:
            owners.setdefault(x, set()).add(i)
    owned_min = {x: min(ds) for x, ds in owners.items() if len(ds) >= 2}
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        assert 1 <= r.span_start <= r.span_end <= ntok[r.doc_id]
        assert r.span_tokens == r.span_end - r.span_start + 1 >= w
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for d, spans in by_doc.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2  # disjoint AND non-adjacent (maximal merge)
    # an owner doc may appear in by_doc only via windows it does NOT own
    for d, spans in by_doc.items():
        toks = texts[d].split()
        for s, e in spans:
            for i in range(s, e - w + 2):
                win = " ".join(toks[i - 1 : i - 1 + w])
                assert owned_min.get(win) != d or d != min(
                    owners[win]
                ), "owner's own copy was marked"


@given(texts=st.lists(_DOC, min_size=1, max_size=6), w=st.integers(3, 5))
@settings(**_SETTINGS)
def test_substring_rewrite_conserves_tokens(spark, texts, w):
    """Rewrite invariants: n_after = n_before − total span tokens from
    the plan; surviving text has exactly n_after tokens; docs without
    spans keep all tokens."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        apply_substring_dedup,
        substring_dedup_spans,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    plan = {}
    for r in substring_dedup_spans(df, window=w).collect():
        plan[r.doc_id] = plan.get(r.doc_id, 0) + r.span_tokens
    out = apply_substring_dedup(df, window=w).collect()
    assert len(out) == len(texts)
    for r in out:
        assert r.n_tokens_before == len(texts[r.doc_id].split())
        assert r.n_tokens_after == r.n_tokens_before - plan.get(r.doc_id, 0)
        got_tokens = r.text_deduped.split() if r.text_deduped else []
        assert len(got_tokens) == r.n_tokens_after


@given(texts=st.lists(_DOC, min_size=2, max_size=5), w=st.integers(3, 5))
@settings(**_SETTINGS)
def test_longest_shared_matches_bruteforce_lcs(spark, texts, w):
    """longest_shared_tokens equals the true longest common token
    substring (when that LCS is >= the window size) computed by a
    brute-force python scan, for every reported pair."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        longest_shared_substring,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.longest_shared_tokens
        for r in longest_shared_substring(
            df, window=w, max_docs_per_window=100
        ).collect()
    }

    def lcs_tokens(a: list[str], b: list[str]) -> int:
        best = 0
        for i in range(len(a)):
            for j in range(len(b)):
                k = 0
                while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                    k += 1
                best = max(best, k)
        return best

    toks = [t.split() for t in texts]
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            true = lcs_tokens(toks[a], toks[b])
            if true >= w:
                assert got.get((a, b)) == true, ((a, b), got.get((a, b)), true)
            else:
                assert (a, b) not in got


@given(
    corpus=st.lists(_DOC, min_size=1, max_size=4),
    batch=st.lists(_DOC, min_size=1, max_size=4),
    w=st.integers(3, 5),
)
@settings(**_SETTINGS)
def test_substring_probe_matches_bruteforce(spark, corpus, batch, w):
    """Probe hit counts and longest copied run equal a brute-force
    python recomputation against the corpus window set."""
    from etl_platform_nyc_taxi_spark.operators.dedup import (
        substring_probe_new,
    )

    cdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    bdf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_windows, r.n_hit_windows, r.longest_hit_run_tokens)
        for r in substring_probe_new(bdf, cdf, window=w).collect()
    }
    cset = set()
    for t in corpus:
        cset |= set(_brute_windows(t, w))
    for i, t in enumerate(batch):
        wins = _brute_windows(t, w)
        hit_pos = [p for p, win in enumerate(wins) if win in cset]
        n_hits = len(hit_pos)
        longest = 0
        run = 0
        prev = None
        for p in hit_pos:
            run = run + 1 if prev is not None and p == prev + 1 else 1
            longest = max(longest, run)
            prev = p
        want = (len(wins), n_hits, longest + w - 1 if longest else 0)
        assert got[100 + i] == want, (t, got[100 + i], want)


@given(payload=st.binary(min_size=0, max_size=512))
@settings(max_examples=200, deadline=None)
def test_audio_sniffers_never_crash_on_fuzz(payload):
    """sniff_audio_header (incl. the MP3 sync walk and OGG page parse)
    must be total on arbitrary bytes: no exception, and any duration it
    does report is a non-negative int."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        sniff_audio_header,
    )

    for tail in (None, payload[::-1]):
        fmt, dur = sniff_audio_header(payload, total_size=len(payload), tail=tail)
        assert fmt is None or isinstance(fmt, str)
        assert dur is None or (isinstance(dur, int) and dur >= 0)


# ---------------------------------------------------------------------------
# Round-10 closed forms vs brute-force references
# ---------------------------------------------------------------------------


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=12),
    budget_pct=st.integers(min_value=1, max_value=120),
    epoch_cap=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_unimax_closed_form_matches_iterative(spark, sizes, budget_pct, epoch_cap):
    """The window closed form (crossover scalars + largest remainder) must
    equal the paper's sequential waterfilling loop for ANY sizes/budget,
    including infeasible budgets (> Σcap) and all-tie inputs."""
    from etl_platform_nyc_taxi_spark.operators.sampling import unimax_allocation
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source
    from tests.test_sampling import _unimax_bruteforce

    budget = max(sum(sizes) * budget_pct // 100, 0)
    sizes_df = rows_source(
        spark,
        [(f"g{i:03d}", n) for i, n in enumerate(sizes)],
        "grp string, n_tok long",
    )
    budget_df = rows_source(spark, [(budget,)], "budget long")
    got = {
        r["grp"]: r["alloc"]
        for r in unimax_allocation(
            sizes_df, ["grp"], epoch_cap=epoch_cap, budget=budget_df
        ).collect()
    }
    caps = [n * epoch_cap for n in sizes]
    if budget >= sum(caps):
        want = {f"g{i:03d}": c for i, c in enumerate(caps)}
    else:
        bf = _unimax_bruteforce(sizes, epoch_cap, budget)
        want = {f"g{i:03d}": a for i, a in enumerate(bf)}
        assert sum(want.values()) == budget  # exact spend when feasible
    assert got == want


_WORD = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_SHORT_DOC = st.lists(_WORD, min_size=1, max_size=12).map(" ".join)


@given(texts=st.lists(_SHORT_DOC, min_size=2, max_size=6))
@settings(**_SETTINGS)
def test_jaccard_prefix_join_property(spark, texts):
    """Prefix-filtered join == naive all-pairs on random tiny-vocab docs
    (the adversarial case for prefix filtering: every element frequent)."""
    import itertools

    from etl_platform_nyc_taxi_spark.operators.dedup import jaccard_prefix_join
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    df = rows_source(
        spark, list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_inter"], r["n_union"])
        for r in jaccard_prefix_join(df, threshold_pct=60, ngram=2).collect()
    }

    def bigrams(t):
        toks = t.split()
        return {" ".join(toks[i : i + 2]) for i in range(max(len(toks) - 1, 1))}

    want = {}
    for a, b in itertools.combinations(range(len(texts)), 2):
        sa, sb = bigrams(texts[a]), bigrams(texts[b])
        inter, union = len(sa & sb), len(sa | sb)
        if inter * 100 >= union * 60:
            want[(a, b)] = (inter, union)
    assert got == want


@given(texts=st.lists(_SHORT_DOC, min_size=1, max_size=5))
@settings(**_SETTINGS)
def test_cdc_chunks_tile_documents(spark, texts):
    """CDC chunks partition each doc exactly: duplicating the corpus makes
    every chunk cross-doc, and summed (len x occurrences) token mass must
    equal twice the corpus token count."""
    from pyspark.sql import functions as F

    from etl_platform_nyc_taxi_spark.operators.dedup import cdc_chunk_dedup
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    rows = list(enumerate(texts)) + [
        (i + 1_000_000, t) for i, t in enumerate(texts)
    ]
    df = rows_source(spark, rows, "doc_id long, text string")
    out = cdc_chunk_dedup(df, divisor=4).collect()
    total = sum(r["len_tokens"] * r["n_chunks"] for r in out)
    assert total == 2 * sum(len(t.split()) for t in texts)
