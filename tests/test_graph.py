"""Connected-components semantics on hand-built graphs: chains (diameter
> 1 forces real iteration), multiple components, singletons, canonical
selection."""

from __future__ import annotations

from etl_platform_nyc_taxi_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_chain_collapses_to_min_label(spark):
    # 5-4-3-2-1 chain: diameter 4 — label 1 must propagate the whole way
    out = {
        r["node"]: r["component"]
        for r in connected_components(
            _edges(spark, [(5, 4), (4, 3), (3, 2), (2, 1)])
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_multiple_components_stay_separate(spark):
    out = {
        r["node"]: r["component"]
        for r in connected_components(
            _edges(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 20)])
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_dedup_clusters_canonical_and_singletons(spark):
    pairs = _edges(spark, [(1, 2), (2, 3)])
    all_ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 99)], "doc_id long")
    out = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in dedup_clusters(pairs, all_ids=all_ids).collect()
    }
    assert out[1] == (1, True)
    assert out[2] == (1, False) and out[3] == (1, False)
    assert out[99] == (99, True)  # singleton: own component, kept
    # exactly one canonical per component
    assert sum(1 for c, canon in out.values() if canon) == 2


def test_max_iter_exhaustion_fails_loud(spark):
    """Code-review r7: exhausting max_iter means the labels are NOT a
    fixpoint — one true component would silently split into several and
    duplicates would survive dedup. The operator must raise, not return
    wrong components (the old behavior returned partial labels AND
    logged 'converged')."""
    import pytest

    chain = _edges(spark, [(5, 4), (4, 3), (3, 2), (2, 1)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=1)
    # the same chain with enough rounds converges to ONE component
    out = connected_components(chain, max_iter=10)
    assert out.count() == 5
    assert out.select("component").distinct().count() == 1


def test_round_count_logged_and_fixture_shallow(spark):
    # VERDICT r2 task 4: instrument rounds-to-fixpoint. Min-label
    # propagation needs ~diameter rounds (+1 to detect fixpoint); the
    # near-dup fixture graph is mutant<->original chains, so it must
    # converge fast — if this creeps past 5, implement the Kiveris
    # large-star/small-star variant (see module docstring).
    from etl_platform_nyc_taxi_spark.operators import graph
    from etl_platform_nyc_taxi_spark.operators.dedup import minhash_near_dups
    from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture

    docs = load_fixture(spark, "/root/testdata/sf0.001", "documents")
    base = docs.select("doc_id", "text")
    mutants = docs.select(
        (docs.doc_id + 1_000_000).alias("doc_id"), "text"
    )
    pairs = minhash_near_dups(base.unionByName(mutants), threshold=1.0)
    graph.connected_components(pairs)
    assert 1 <= graph.LAST_CC_ROUNDS <= 5, graph.LAST_CC_ROUNDS


def test_round_count_matches_chain_diameter(spark):
    from etl_platform_nyc_taxi_spark.operators import graph

    # path graph 0-1-2-...-7: diameter 7, min-label propagation halves
    # nothing (plain neighbor propagation) so rounds ≈ diameter + 1
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "id_a long, id_b long"
    )
    out = {
        r["node"]: r["component"]
        for r in graph.connected_components(edges).collect()
    }
    assert set(out.values()) == {0}
    assert graph.LAST_CC_ROUNDS >= 4  # deep chain: propagation is per-hop


def test_count_triangles_known_graph(spark):
    from etl_platform_nyc_taxi_spark.operators.graph import count_triangles

    # K4 on {1,2,3,4} (4 triangles) plus a pendant edge (no new triangle)
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(4, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = count_triangles(df).collect()[0]
    assert (row["n_edges"], row["n_triangles"]) == (7, 4)


def test_count_triangles_triangle_free(spark):
    from etl_platform_nyc_taxi_spark.operators.graph import count_triangles

    # star graph: no triangles
    df = spark.createDataFrame([(1, i) for i in range(2, 8)], "src long, dst long")
    row = count_triangles(df).collect()[0]
    assert (row["n_edges"], row["n_triangles"]) == (6, 0)


# ---------------------------------------------------------------------------
# Round 5: pagerank
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

from etl_platform_nyc_taxi_spark.sources.rows import rows_source  # noqa: E402
from tests.conftest import rows  # noqa: E402


def test_pagerank_mass_conserved_and_symmetric(spark):
    from etl_platform_nyc_taxi_spark.operators.graph import pagerank

    # Path graph 1-2-3: by symmetry pr(1) == pr(3), center highest.
    edges = rows_source(spark, [(1, 2), (2, 3)], "src long, dst long")
    out = {r["node"]: r["pagerank"] for r in pagerank(edges, iters=5).collect()}
    assert set(out) == {1, 2, 3}
    # Total mass = (1-d) + d * (total contribution) = 1 on a symmetrized
    # graph with no dangling nodes (up to the 1e-14 decimal quantization).
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-9)
    assert out[1] == out[3] < out[2]


def test_pagerank_uniform_on_regular_graph(spark):
    from etl_platform_nyc_taxi_spark.operators.graph import pagerank

    # 4-cycle: every node degree 2 -> stationary from the start: all 1/4.
    edges = rows_source(
        spark, [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    out = {r["node"]: r["pagerank"] for r in pagerank(edges, iters=3).collect()}
    assert all(v == pytest.approx(0.25, abs=1e-12) for v in out.values())


def test_pagerank_deterministic_across_partitioning(spark):
    from etl_platform_nyc_taxi_spark.operators.graph import pagerank

    import random as _r

    _r.seed(13)
    e = list({(_r.randint(1, 30), _r.randint(1, 30)) for _ in range(80)})
    e = [(a, b) for a, b in e if a != b]
    d1 = rows_source(spark, e, "src long, dst long")
    d2 = rows_source(spark, e, "src long, dst long").repartition(11)
    r1 = rows(pagerank(d1, iters=3))
    r2 = rows(pagerank(d2, iters=3))
    assert r1 == r2  # bit-identical, not approximately equal


def test_bfs_distances_chain(spark):
    from etl_platform_nyc_taxi_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "src long, dst long"
    )
    sources = spark.createDataFrame([(1,)], "node long")
    out = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, sources, max_hops=3).collect()
    }
    # 5 is 4 hops away -> cut off; 10/11 unreachable
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_distances_multi_source_min(spark):
    from etl_platform_nyc_taxi_spark.operators.graph import bfs_distances

    # two sources; node 3 reachable from both (dist 2 from 1, dist 1 from 4)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 3)], "src long, dst long"
    )
    sources = spark.createDataFrame([(1,), (4,)], "node long")
    out = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, sources, max_hops=4).collect()
    }
    assert out == {1: 0, 4: 0, 2: 1, 3: 1}


def test_bfs_distances_undirected_and_early_exit(spark):
    from etl_platform_nyc_taxi_spark.operators.graph import bfs_distances

    # edge given one way only; BFS symmetrizes (2 reaches 1)
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    sources = spark.createDataFrame([(2,)], "node long")
    out = {
        r["node"]: r["dist"]
        # max_hops far beyond diameter: early-exit must terminate
        for r in bfs_distances(edges, sources, max_hops=10).collect()
    }
    assert out == {2: 0, 1: 1}


def test_bfs_distances_rejects_negative_hops(spark):
    import pytest

    from etl_platform_nyc_taxi_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    sources = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(ValueError):
        bfs_distances(edges, sources, max_hops=-1)


def test_connected_components_rejects_nonpositive_max_iter(spark):
    """ADVICE r7: max_iter<=0 used to skip the loop and hit a NameError
    on the convergence check — must be a named ValueError up front."""
    import pytest

    from etl_platform_nyc_taxi_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    for bad in (0, -3):
        with pytest.raises(ValueError, match="max_iter"):
            connected_components(edges, max_iter=bad)


# --- Kiveris large-star/small-star (r11: VERDICT r10 task 5) ---------------


def test_star_chain_collapses_to_min_label(spark):
    from etl_platform_nyc_taxi_spark.operators import graph as G

    out = {
        r["node"]: r["component"]
        for r in G.connected_components_star(
            _edges(spark, [(5, 4), (4, 3), (3, 2), (2, 1)])
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}
    assert G.LAST_CC_METHOD == "star"


def test_star_logarithmic_rounds_on_long_chain(spark):
    # 64-node chain: diameter 63. Min-label needs ~63 rounds; the star
    # variant must close in O(log diameter) — assert a generous ceiling
    # far below the linear bound.
    from etl_platform_nyc_taxi_spark.operators import graph as G

    chain = _edges(spark, [(i + 1, i) for i in range(1, 64)])
    out = {
        r["node"]: r["component"]
        for r in G.connected_components_star(chain, max_iter=20).collect()
    }
    assert out == {i: 1 for i in range(1, 65)}
    assert G.LAST_CC_ROUNDS <= 10, (
        f"star CC took {G.LAST_CC_ROUNDS} rounds on a 63-diameter chain"
    )


def test_star_handles_self_loops_and_multiple_components(spark):
    from etl_platform_nyc_taxi_spark.operators.graph import (
        connected_components_star,
    )

    out = {
        r["node"]: r["component"]
        for r in connected_components_star(
            _edges(spark, [(7, 7), (1, 2), (2, 3), (10, 11)])
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 10: 10, 11: 10}


def test_star_equals_minlabel_on_random_graphs(spark):
    """Property: both algorithms produce the identical (node, component)
    relation on seeded Erdős–Rényi-ish graphs of varied density."""
    import random

    from etl_platform_nyc_taxi_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    for seed, n, m in [(11, 30, 15), (12, 40, 40), (13, 25, 80), (14, 50, 10)]:
        rng = random.Random(seed)
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        pairs = [p for p in pairs if p[0] != p[1]]
        if not pairs:
            continue
        edges = _edges(spark, pairs)
        a = {
            r["node"]: r["component"]
            for r in connected_components(edges, max_iter=60).collect()
        }
        b = {
            r["node"]: r["component"]
            for r in connected_components_star(edges, max_iter=30).collect()
        }
        assert a == b, f"divergence on seed {seed}: {a} vs {b}"


def test_auto_escalates_above_threshold_and_matches(spark):
    from etl_platform_nyc_taxi_spark.operators import graph as G

    # 32-node chain, threshold 4: min-label cannot converge in 4 rounds,
    # auto must escalate to the star variant and still return the exact
    # min-label components.
    chain = _edges(spark, [(i + 1, i) for i in range(1, 32)])
    out = {
        r["node"]: r["component"]
        for r in G.connected_components(
            chain, max_iter=25, method="auto", star_threshold=4
        ).collect()
    }
    assert out == {i: 1 for i in range(1, 33)}
    assert G.LAST_CC_METHOD == "minlabel->star"


def test_auto_stays_minlabel_below_threshold(spark):
    from etl_platform_nyc_taxi_spark.operators import graph as G

    out = {
        r["node"]: r["component"]
        for r in G.connected_components(
            _edges(spark, [(1, 2), (2, 3)]), method="auto"
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}
    assert G.LAST_CC_METHOD == "minlabel"


def test_connected_components_rejects_unknown_method(spark):
    import pytest

    from etl_platform_nyc_taxi_spark.operators.graph import (
        connected_components,
    )

    with pytest.raises(ValueError, match="unknown connected-components"):
        connected_components(_edges(spark, [(1, 2)]), method="banana")


def test_non_convergence_raises_dedicated_type(spark):
    """ADVICE r11: the auto path escalates on ConvergenceError ONLY — a
    bare RuntimeError from anywhere else must propagate. Pin that the
    non-convergence raise IS the dedicated subtype (backwards-compatible
    with RuntimeError catches) on both algorithm variants."""
    import pytest

    from etl_platform_nyc_taxi_spark.operators.graph import (
        ConvergenceError,
        connected_components,
        connected_components_star,
    )

    assert issubclass(ConvergenceError, RuntimeError)
    chain = _edges(spark, [(5, 4), (4, 3), (3, 2), (2, 1)])
    with pytest.raises(ConvergenceError, match="did not converge"):
        connected_components(chain, max_iter=1)
    with pytest.raises(ConvergenceError, match="did not converge"):
        connected_components_star(chain, max_iter=1)


def test_label_propagation_two_triangles_with_bridge(spark):
    """Two triangles joined by one bridge edge: CC merges everything;
    closed-neighborhood LPA keeps the two dense cores as distinct
    communities (the anti-over-merge property the operator exists for)."""
    from etl_platform_nyc_taxi_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "id_a long, id_b long",
    )
    cc = connected_components(edges)
    assert len({r[1] for r in cc.collect()}) == 1  # one CC
    lab = {r["node"]: r["label"] for r in label_propagation(edges).collect()}
    assert lab[1] == lab[2] == lab[3]
    assert lab[4] == lab[5] == lab[6]
    assert lab[1] != lab[4]


def test_label_propagation_deterministic_and_chain_stable(spark):
    """Self-inclusion damps the 2-cycle oscillation of synchronous LPA:
    a 3-chain converges to one community and repeated runs are
    bit-identical."""
    from etl_platform_nyc_taxi_spark.operators.graph import label_propagation

    edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    a = sorted(tuple(r) for r in label_propagation(edges).collect())
    b = sorted(tuple(r) for r in label_propagation(edges).collect())
    assert a == b
    assert a == [(1, 1), (2, 1), (3, 1)]
