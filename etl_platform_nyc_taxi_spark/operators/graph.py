"""Graph operators for dedup pipelines: connected components over
near-duplicate pair sets.

Pair generation (MinHash-LSH, SimHash, embedding-LSH) leaves a graph:
doc A ~ doc B, B ~ C. Keeping "one per pair" double-drops B; what every
production dedup pipeline actually does is CLUSTER the pairs into
connected components and keep one canonical doc per component. This
module provides that step as iterative min-label propagation on
DataFrames — the textbook MapReduce-CC shape (cf. Kiveris et al.,
"Connected Components in MapReduce and Beyond"): every node repeatedly
adopts the smallest label in its closed neighborhood until fixpoint.

Scale notes:
* per iteration: one join (edges ⋈ labels) + one min-aggregate — both
  shuffle on the node key, both combine map-side;
* iteration count is bounded by the component DIAMETER, not size — near-
  dup components are short chains (mutant ↔ original), so 3-5 rounds
  close real corpora; ``max_iter`` guards degenerate graphs;
* each round ``localCheckpoint``s the label relation: iterative loops
  otherwise re-execute the whole lineage per action and the plan tree
  grows without bound (the same pattern pyspark.ml uses internally);
* convergence is detected with a count of changed labels — one action
  per round, on a relation already materialized by the checkpoint.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


class ConvergenceError(RuntimeError):
    """An iterative graph computation exhausted ``max_iter`` without
    reaching fixpoint. A dedicated type (ADVICE r11) so ``method="auto"``
    escalates ONLY on genuine non-convergence — a bare RuntimeError from
    anywhere else in the attempt (executor loss, a broken input relation)
    must propagate, not be misdiagnosed as a pathological-diameter graph
    and silently retried with the star variant."""

#: Rounds the last :func:`connected_components` call took to converge —
#: observability hook (also logged): iteration count is bounded by the
#: component DIAMETER for min-label propagation and by O(log diameter)
#: for the Kiveris large-star/small-star variant
#: (:func:`connected_components_star`).
LAST_CC_ROUNDS: int = 0

#: Which algorithm the last :func:`connected_components` call ran:
#: "minlabel", "star", or "minlabel->star" (auto-escalation fired).
LAST_CC_METHOD: str = ""


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    partitions: int | None = None,
    method: str = "minlabel",
    star_threshold: int = 8,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = smallest
    node id reachable from the node (undirected). Deterministic.

    ``method``:

    * ``"minlabel"`` (default) — min-label propagation, O(diameter)
      rounds. The right choice for near-dup graphs, whose components are
      short mutant↔original chains (3-5 rounds on real corpora).
    * ``"star"`` — Kiveris alternating large-star/small-star
      (:func:`connected_components_star`), O(log diameter) rounds: the
      100 TB escape hatch for deep-chain graphs where diameter grows with
      the corpus (VERDICT r10 task 5).
    * ``"auto"`` — min-label capped at ``star_threshold`` rounds; if the
      graph hasn't converged by then its diameter is pathological for
      label propagation and the computation escalates to the star
      variant (which restarts from the edges — labels from a non-
      converged propagation aren't reusable state, and the threshold
      bounds the wasted work at ``star_threshold`` cheap rounds).

    Both algorithms produce identical output (property-tested on random
    graphs in tests/test_graph.py); observability via
    :data:`LAST_CC_ROUNDS` / :data:`LAST_CC_METHOD`.

    ``partitions`` right-sizes the iteration relations: the edge set of a
    near-dup graph is typically orders of magnitude smaller than the
    corpus that produced it, and every loop round pays per-task overhead
    × partition count — coalesce to match the EDGE volume, not the
    upstream scan's width."""
    global LAST_CC_METHOD
    if method not in ("minlabel", "star", "auto"):
        raise ValueError(f"unknown connected-components method: {method!r}")
    if method == "star":
        return connected_components_star(edges, src, dst, max_iter, partitions)
    if method == "auto":
        try:
            out = connected_components(
                edges, src, dst, min(max_iter, star_threshold), partitions
            )
            LAST_CC_METHOD = "minlabel"
            return out
        except ConvergenceError:
            logger.warning(
                "min-label propagation exceeded %d rounds — escalating to "
                "large-star/small-star",
                star_threshold,
            )
            out = connected_components_star(
                edges, src, dst, max_iter, partitions
            )
            LAST_CC_METHOD = "minlabel->star"
            return out
    LAST_CC_METHOD = "minlabel"
    if max_iter < 1:
        # The loop body must run at least once for the convergence check
        # (``changed``) to be defined; <1 would be a silent no-op that
        # returned identity labels for a connected graph.
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    # Materialize the edge relation before symmetrizing: the union's two
    # branches otherwise re-execute the whole upstream pair-generation
    # pipeline (LSH signatures + verify joins) once each — the edges are
    # tiny relative to what produces them, so checkpoint first, fan out
    # second.
    edges = edges.localCheckpoint(eager=False)
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    if partitions:
        sym = sym.repartition(partitions, "v")
    sym = sym.distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    global LAST_CC_ROUNDS
    rounds = 0
    for _ in range(max_iter):
        # Tag the sources so the aggregate yields BOTH the new label
        # (min over the closed neighborhood) and the old one (min over
        # the labels-sourced rows only — exactly one per node): change
        # detection reads the aggregate itself instead of joining against
        # the previous labels, and the non-eager checkpoint makes the
        # change-count THE materializing action — one Spark job per round
        # (the per-round fixed cost is what dominates small graphs),
        # still with full lineage truncation.
        neighbor_labels = sym.join(
            labels, sym["v"] == labels["node"], "inner"
        ).select(F.col("u").alias("node"), F.col("label"), F.lit(0).alias("__own"))
        new_labels = (
            labels.withColumn("__own", F.lit(1))
            .unionByName(neighbor_labels)
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("__own") == 1, F.col("label"))).alias("__old"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("label") != F.col("__old")).count()
        labels = new_labels.drop("__old")
        rounds += 1
        if changed == 0:
            break
    LAST_CC_ROUNDS = rounds
    if changed != 0:
        # Min-label propagation converges in O(graph diameter) rounds;
        # exhausting max_iter means labels are NOT a fixpoint and one
        # true component would be returned as several — silently wrong
        # dedup clusters. Fail loudly instead: the caller raises
        # max_iter (diameter-bound) for chain-shaped graphs.
        raise ConvergenceError(
            f"connected_components did not converge in {max_iter} "
            f"round(s) ({changed} labels still moving); the graph "
            "diameter exceeds max_iter — raise max_iter"
        )
    logger.info("connected_components converged in %d round(s)", rounds)
    return labels.select(F.col("node"), F.col("label").alias("component"))


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    partitions: int | None = None,
) -> DataFrame:
    """Connected components via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014): same (node, component = min reachable id) contract as
    :func:`connected_components`, but convergence in O(log diameter)
    rounds instead of O(diameter) — the variant for 100 TB near-dup
    graphs where chained mutants stretch component diameter with corpus
    size.

    Each round rewires the edge relation toward min-id stars:

    * **large-star** — per node ``u``, every STRICTLY LARGER neighbor is
      reconnected to ``m = min(Γ(u) ∪ {u})``: tall trees flatten
      (doubling-style) while every changed edge keeps both endpoints in
      the same component;
    * **small-star** — per node ``u`` over its smaller-or-equal
      neighborhood (edges oriented larger→smaller), ``u`` and all its
      smaller neighbors attach to the minimum: local stars canonicalize.

    Fixpoint = the edge set is a union of min-rooted stars, i.e. exactly
    the (node → component) mapping. Each phase is one shuffle join + one
    min-aggregate on the edge relation (the same per-round cost as one
    min-label round); rounds ``localCheckpoint`` to truncate lineage;
    convergence is an empty symmetric difference of successive edge sets
    (two anti-join counts on the checkpointed relations). Deterministic:
    min() everywhere, no tie-breaking needed."""
    global LAST_CC_ROUNDS, LAST_CC_METHOD
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Canonical larger→smaller orientation, self-loops dropped (isolated
    # self-loop nodes re-enter via the final `nodes` join).
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
    )
    if partitions:
        e = e.repartition(partitions, "u")
    e = e.localCheckpoint(eager=True)
    rounds = 0
    delta = 0
    for _ in range(max_iter):
        # large-star: symmetrize, m = min of the closed neighborhood,
        # reconnect every strictly larger neighbor to m. Output edges
        # (v, m) keep the larger→smaller orientation (m <= u < v).
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m_of = (
            sym.groupBy("u")
            .agg(F.min("v").alias("__mn"))
            .select("u", F.least("u", "__mn").alias("m"))
        )
        ls = (
            sym.join(m_of, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: per larger-endpoint u over its smaller neighbors,
        # attach u and every non-min neighbor to the min. Orientation is
        # preserved (every emitted edge is (x, m) with x > m).
        nmin = ls.groupBy("u").agg(F.min("v").alias("m"))
        new_e = (
            nmin.select("u", F.col("m").alias("v"))
            .unionByName(
                ls.join(nmin, "u")
                .filter(F.col("v") != F.col("m"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        delta = (
            new_e.join(e, ["u", "v"], "left_anti").count()
            + e.join(new_e, ["u", "v"], "left_anti").count()
        )
        e = new_e
        rounds += 1
        if delta == 0:
            break
    LAST_CC_ROUNDS = rounds
    LAST_CC_METHOD = "star"
    if delta != 0:
        raise ConvergenceError(
            f"connected_components_star did not converge in {max_iter} "
            f"round(s) ({delta} edges still moving) — raise max_iter"
        )
    logger.info("connected_components_star converged in %d round(s)", rounds)
    return nodes.join(
        e.select(F.col("u").alias("node"), F.col("v").alias("component")),
        "node",
        "left",
    ).select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame | None = None,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    partitions: int | None = None,
    method: str = "auto",
    star_threshold: int = 8,
) -> DataFrame:
    """Cluster near-dup pairs and pick one canonical doc per cluster.

    Output: (doc_id, component, is_canonical) — ``is_canonical`` marks
    the cluster's minimum id (the standard keep-the-first policy; swap
    the ordering upstream for quality-based selection). With ``all_ids``
    given, singleton docs (no near-dup) appear as their own component —
    the full keep/drop decision for the corpus in one relation.

    ``method="auto"`` (default, VERDICT r10 task 5): min-label
    propagation while the graph converges within ``star_threshold``
    rounds — the measured 3-5-round regime of real near-dup corpora —
    escalating to Kiveris large-star/small-star
    (:func:`connected_components_star`, O(log diameter) rounds) when a
    deep-chain graph exceeds it. Identical output either way."""
    comp = connected_components(
        pairs,
        src,
        dst,
        max_iter,
        partitions,
        method=method,
        star_threshold=star_threshold,
    )
    if all_ids is not None:
        ids = all_ids.select(F.col(id_col).alias("node")).distinct()
        comp = ids.join(comp, "node", "left").select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
    return comp.select(
        F.col("node").alias(id_col),
        "component",
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 3,
    partitions: int | None = None,
) -> DataFrame:
    """(node, pagerank) after ``iters`` synchronous power iterations over
    the SYMMETRIZED graph (every input edge counts both ways) — the
    importance ranking step of link-graph curation pipelines (e.g.
    quality-weighting crawled documents by site-graph centrality).

    Engine-portable determinism: floating-point SUM is order-dependent,
    so a naive implementation hashes differently on every engine (and
    every shuffle). Here each edge contribution ``r/deg`` — a SINGLE
    IEEE-754 division, bit-identical everywhere given identical inputs —
    is quantized to DECIMAL(28,14) and the per-node mass is accumulated
    in exact decimal arithmetic (order-independent), converted back to
    double only for the affine update ``(1-d)/N + d*mass`` (two more
    single IEEE ops). Every iteration is therefore a pure function of
    the previous one with no summation-order dependence: the same
    algorithm unrolled in ANSI SQL reproduces the output bit-for-bit.

    Scale shape: per iteration one shuffle-join (edges ⋈ ranks on src)
    and one exact-decimal aggregate on dst — identical skeleton to
    :func:`connected_components`, cost = iters × (join + agg). Ranks are
    ``localCheckpoint``-ed per round to truncate lineage. Symmetrization
    guarantees no dangling nodes (every node has out-degree ≥ 1), so no
    dangling-mass redistribution term is needed."""
    edges = edges.localCheckpoint(eager=False)
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
    )
    if partitions:
        sym = sym.repartition(partitions, "s")
    sym = sym.localCheckpoint(eager=True)
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = deg.count()
    if n_nodes == 0:
        return sym.select(
            F.col("s").alias("node"), F.lit(0.0).alias("pagerank")
        )
    base = (1.0 - damping) / n_nodes
    ranks = deg.select(
        F.col("s").alias("node"), F.lit(1.0 / n_nodes).alias("r")
    ).localCheckpoint(eager=True)
    # Static per-edge relation carrying the source degree: built once,
    # reused every round (ReuseExchange picks up the checkpointed scan).
    ed = sym.join(deg, "s").localCheckpoint(eager=True)
    for _ in range(iters):
        contrib = ed.join(ranks, ed["s"] == ranks["node"]).select(
            F.col("d"),
            (F.col("r") / F.col("deg")).cast("decimal(28,14)").alias("c"),
        )
        ranks = (
            contrib.groupBy("d")
            .agg(F.sum("c").alias("mass"))
            .select(
                F.col("d").alias("node"),
                (
                    F.lit(base)
                    + F.lit(damping) * F.col("mass").cast("double")
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("pagerank"))


def count_triangles(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Triangle count over a canonically-oriented edge list (``src <
    dst``, distinct) — returns a 1-row (n_edges, n_triangles) DataFrame,
    never collecting the triangle set.

    Plan: wedge join (e1.dst = e2.src gives ordered paths a<b<c) then
    the closing-edge equi-join — the standard two-shuffle enumeration.
    Ordering by id counts each triangle exactly once; the production
    upgrade when degree skew bites is DEGREE orientation (orient each
    edge low-degree → high-degree; wedge work drops from Σd² on raw ids
    to O(E^1.5) worst-case) on the same join skeleton. Hot vertices are
    a data property — the caller bounds them upstream (here: per-group
    co-occurrence with bounded group size)."""
    # Four consumers of the edge relation (three join branches + the
    # edge count) — checkpoint first so a join-heavy upstream pipeline
    # is not re-executed per consumer (the three scans shuffle on
    # different keys, so ReuseExchange cannot merge them).
    edges = edges.localCheckpoint(eager=False)
    e1 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e2 = edges.select(F.col(src).alias("b"), F.col(dst).alias("c"))
    e3 = edges.select(F.col(src).alias("a"), F.col(dst).alias("c"))
    wedges = e1.join(e2, "b")
    tri = wedges.join(e3, ["a", "c"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    return edges.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(tri)


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """(node, dist) = minimum hop count from any source node, breadth-
    first over the SYMMETRIZED graph, cut off at ``max_hops`` — the
    neighborhood-expansion primitive behind contamination blast-radius
    ("every doc within k dedup-links of a benchmark hit") and
    taint-propagation audits on web-crawl link graphs.

    Frontier algorithm, not Bellman-Ford over all nodes: each round
    expands ONLY the nodes first discovered in the previous round
    (anti-join against the visited set), so total work is
    O(edges-incident-to-reached-nodes), not rounds × |E|. Per round:
    one shuffle-join (frontier ⋈ edges) + one distinct + one anti-join —
    all on the node key. The visited relation is ``localCheckpoint``-ed
    per round (same lineage-truncation discipline as
    :func:`connected_components`). Early-exits when a frontier empties.

    Determinism: distances are exact ints (min over hop counts — no
    floating point anywhere), so any engine reproduces the result
    bit-for-bit; the ANSI mirror is a depth-bounded recursive CTE with a
    final MIN(dist) GROUP BY."""
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    # checkpoint BEFORE the two-branch symmetrize union, or both
    # branches re-execute the upstream edge pipeline once each (same
    # lineage discipline as connected_components)
    edges = edges.localCheckpoint(eager=False)
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = (
        sources.select(F.col(node_col).alias("n")).distinct()
        .localCheckpoint(eager=True)
    )
    visited = frontier.select("n", F.lit(0).alias("dist")).localCheckpoint(
        eager=True
    )
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier["n"] == sym["s"])
            .select(F.col("d").alias("n"))
            .distinct()
            .join(visited.select("n"), "n", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(
            nxt.select("n", F.lit(hop).alias("dist"))
        ).localCheckpoint(eager=True)
        frontier = nxt
    return visited.select(F.col("n").alias(node_col), F.col("dist").cast("int").alias("dist"))


def label_propagation(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    rounds: int = 4,
) -> DataFrame:
    """Synchronous label propagation over a pair relation: ``(node,
    label)`` after a FIXED number of rounds — the community detector
    that keeps chained near-dups apart where connected components
    over-merges them (A~B and B~C chain into one CC even when A≁C;
    under LPA a node adopts the label most FREQUENT among its
    neighbors, so low-connectivity bridges don't propagate).

    Determinism contract (full-oracle replayable, unlike classic async
    LPA): rounds are synchronous (all updates read the previous round's
    labels), the vote is over the CLOSED neighborhood (neighbors' labels
    plus the node's own — self-inclusion damps the 2-cycle oscillation
    synchronous LPA exhibits on chains/bipartite structure), the update
    is "most frequent label, ties to the SMALLEST label", and the round
    count is fixed — no convergence-dependent stopping, no traversal
    order. Init label = own id.

    Scale shape (r13, guide §2.3/§2.4 — the argmax-fold pattern): per
    round one equi-join (edges ⋈ labels, shuffled on the node key) + one
    count aggregate (map-combinable) + one ``max(struct(cnt, −label))``
    argmax aggregate — ``max`` over the struct compares cnt first, then
    −label, which IS "most frequent, ties to the SMALLEST label", the
    same total order the former per-node row_number window sorted by,
    with map-side partials instead of a window sort. The own-label rows
    double as change detection (exactly one (u, label) group per node
    carries the ``__own`` tag — the node's previous label), so each
    round is ONE job (non-eager ``localCheckpoint`` + the change count
    as the materializing action, the connected_components discipline)
    and the loop EARLY-EXITS at fixpoint: the update is a deterministic
    function of the label relation, so once a round changes nothing,
    every remaining round provably reproduces it — the returned
    relation equals the full ``rounds``-round result exactly (near-dup
    mutant graphs converge in 2 rounds; the fixed-round oracle replays
    unchanged). Isolated nodes never enter — compose with a left join
    against the full id universe, as :func:`dedup_clusters` does for CC.
    """
    # checkpoint the PAIR relation before symmetrizing: the union reads
    # it twice, and an un-materialized reference would execute the whole
    # upstream pair trunk (LSH signature + verify) once per branch — the
    # bfs_distances lesson, re-measured here as 2× trunk cost at ×10.
    pairs = pairs.localCheckpoint(eager=True)
    sym = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .unionByName(
            pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select("u").distinct().select(
        F.col("u").alias("node"), F.col("u").alias("label")
    )
    for _ in range(rounds):
        votes = sym.join(labels, sym["v"] == labels["node"]).select(
            "u", "label", F.lit(0).alias("__own")
        ).unionByName(
            labels.select(
                F.col("node").alias("u"), "label", F.lit(1).alias("__own")
            )
        )
        cnt = votes.groupBy("u", "label").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("__own").alias("__has_own"),
        )
        new_labels = (
            cnt.groupBy("u")
            .agg(
                F.max(
                    F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))
                ).alias("__w"),
                F.min(
                    F.when(F.col("__has_own") == 1, F.col("label"))
                ).alias("__old"),
            )
            .select(
                F.col("u").alias("node"),
                (-F.col("__w.nl")).alias("label"),
                "__old",
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("label") != F.col("__old")).count()
        labels = new_labels.drop("__old")
        if changed == 0:
            break
    return labels
