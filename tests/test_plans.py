"""Physical-plan audits: the properties that make queries scale are pinned
here so a regression shows up as a test failure, not a 100 TB incident.

Checks (SURVEY.md §4 / §7.5): predicate pushdown reaches the parquet scan,
column pruning holds, dimension joins broadcast, the top-k window runs on
pre-aggregated input, and no registry query falls back to row-at-a-time
Python UDFs.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from etl_platform_nyc_taxi_spark import queries_registry as QR

SF = "/root/testdata/sf0.001"

#: queries whose callable EXECUTES work when invoked (streaming runs a
#: query to completion) — excluded from lazy plan inspection
_EAGER = {"streaming_daily_counts"}


def fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_range_pushes_predicates_and_prunes_columns(spark):
    s = fmt(QR.QUERIES["filter_range"](spark, SF))
    pushed = s.split("PushedFilters:")[1].splitlines()[0]
    assert "o_orderdate" in pushed and "o_totalprice" in pushed
    read = s.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderkey" in read and "o_comment" not in read


def test_scan_project_prunes_to_selected_columns(spark):
    s = fmt(QR.QUERIES["scan_project"](spark, SF))
    read = s.split("ReadSchema:")[1].splitlines()[0]
    for col in ("c_custkey", "c_name", "c_acctbal", "c_mktsegment"):
        assert col in read
    assert "c_address" not in read and "c_comment" not in read


def test_star_join_broadcasts_dimensions(spark):
    s = fmt(QR.QUERIES["join_star_dims"](spark, SF))
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s


def test_top5_zones_window_runs_on_preaggregated_input(spark):
    """The D1 fix at scale: dense_rank's single-partition window must sit
    ABOVE the hash aggregate (input ≤ distinct keys, not raw rows)."""
    import re

    s = fmt(QR.QUERIES["top5_zones"](spark, SF))
    # numbered detail entries run leaf → root: the aggregate must carry a
    # lower node id than the window
    nodes = dict()
    for num, name in re.findall(r"^\((\d+)\) (\w+)", s, re.M):
        nodes.setdefault(name, int(num))
    assert nodes["HashAggregate"] < nodes["Window"]
    # bonus property: Spark pushes a partial top-k (WindowGroupLimit)
    # below the single-partition exchange, so the exchange moves ≤ k rows
    # per upstream partition, not every distinct key
    assert "WindowGroupLimit" in nodes


def test_minhash_has_no_cartesian_product(spark):
    s = fmt(QR.QUERIES["dedup_minhash_lsh"](spark, SF))
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s


@pytest.mark.parametrize("name", sorted(set(QR.QUERIES) - _EAGER))
def test_no_rowwise_python_udf_anywhere(spark, name):
    """Registry queries must stay JVM-side: no BatchEvalPython (row-at-a-
    time Python UDF) in any plan. (Arrow mapInPandas is allowed by design
    but no registry query needs it either.)"""
    s = fmt(QR.QUERIES[name](spark, SF))
    assert "BatchEvalPython" not in s


def test_pack_sequences_window_is_partitioned(spark):
    """Packing must never serialize the corpus through one partition: the
    cumsum window partitions by the group key (no SinglePartition
    exchange anywhere in the plan)."""
    s = fmt(QR.QUERIES["pack_sequences"](spark, SF))
    assert "Window" in s
    assert "SinglePartition" not in s


def test_cdc_latest_state_window_is_partitioned(spark):
    s = fmt(QR.QUERIES["cdc_latest_state"](spark, SF))
    assert "SinglePartition" not in s
    # partial per-partition top-1 below the exchange: only each task's
    # candidate row shuffles, not every event
    assert "WindowGroupLimit" in s


def test_join_salted_no_cartesian_and_prunes_columns(spark):
    s = fmt(QR.QUERIES["join_salted"](spark, SF))
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s
    read = [l for l in s.splitlines() if "ReadSchema" in l]
    orders = [l for l in read if "o_custkey" in l]
    assert orders and all("o_comment" not in l for l in orders)


def test_corpus_top_ngrams_window_above_aggregate(spark):
    """Global row_number ranks the per-gram AGGREGATE (≤ |vocab²| rows),
    never the exploded gram stream."""
    import re

    s = fmt(QR.QUERIES["corpus_top_ngrams"](spark, SF))
    nodes = dict()
    for num, name in re.findall(r"^\((\d+)\) (\w+)", s, re.M):
        nodes.setdefault(name, int(num))
    assert nodes["HashAggregate"] < nodes["Window"]


def test_contamination_check_prunes_documents_scan(spark):
    s = fmt(QR.QUERIES["contamination_check"](spark, SF))
    read = [l for l in s.splitlines() if "ReadSchema" in l]
    assert read and all("lang" not in l and "source" not in l for l in read)


def test_quality_filter_single_scan_no_shuffle(spark):
    """Flags are pure per-row expressions: the plan must contain no
    exchange at all — it runs at scan speed."""
    s = fmt(QR.QUERIES["text_quality_filter"](spark, SF))
    assert "Exchange" not in s


def test_event_funnel_single_exchange_for_all_stages(spark):
    """All K stage windows AND the per-user aggregate share one user_id
    exchange (unordered partition windows + groupBy on the same key);
    only the final count crosses a second (single-partition) exchange."""
    s = fmt(QR.QUERIES["event_funnel"](spark, SF))
    import re

    exchanges = re.findall(r"^\(\d+\) Exchange", s, re.M)
    assert len(exchanges) <= 2, s
    read = s.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read and "value" not in read  # pruned


def test_json_extract_props_prunes_scan_and_stays_jvm(spark):
    s = fmt(QR.QUERIES["json_extract_props"](spark, SF))
    read = s.split("ReadSchema:")[1].splitlines()[0]
    assert "props" in read and "event_type" in read
    assert "value" not in read and "user_id" not in read
    assert "BatchEvalPython" not in s


def test_window_time_range_is_partitioned_single_sort(spark):
    """RANGE frame runs inside the user_id partitioning: one exchange,
    one sort, no single-partition window."""
    import re

    s = fmt(QR.QUERIES["window_time_range"](spark, SF))
    assert len(re.findall(r"^\(\d+\) Exchange", s, re.M)) == 1
    assert len(re.findall(r"^\(\d+\) Sort", s, re.M)) == 1
    assert "SinglePartition" not in s


def test_rollup_cascade_daily_consumes_hourly_aggregate(spark):
    """The daily aggregate's input is the hourly HashAggregate, not the
    raw scan — mergeable-partial reaggregation (one fact-table pass)."""
    import re

    s = fmt(QR.QUERIES["rollup_cascade"](spark, SF))
    scans = re.findall(r"^\(\d+\) Scan parquet", s, re.M)
    assert len(scans) == 1
    aggs = [int(m) for m in re.findall(r"^\((\d+)\) HashAggregate", s, re.M)]
    assert len(aggs) == 4  # partial+final hourly, partial+final daily


def test_zorder_prunes_to_two_columns(spark):
    s = fmt(QR.QUERIES["zorder_layout"](spark, SF))
    read = [l for l in s.splitlines() if "ReadSchema" in l]
    assert read and all(
        "o_totalprice" in l and "o_custkey" in l and "o_orderpriority" not in l
        for l in read
    ), s


def test_cohort_retention_pushes_null_filter(spark):
    s = fmt(QR.QUERIES["cohort_retention"](spark, SF))
    pushed = s.split("PushedFilters:")[1].splitlines()[0]
    assert "IsNotNull(ts)" in pushed, pushed
    read = s.split("ReadSchema:")[1].splitlines()[0]
    assert "user_id" in read and "props" not in read


def test_zscore_stats_join_broadcasts(spark):
    s = fmt(QR.QUERIES["zscore_outliers"](spark, SF))
    assert "BroadcastHashJoin" in s and "CartesianProduct" not in s


def test_graph_triangles_pushes_quantity_filter(spark):
    s = fmt(QR.QUERIES["graph_triangles"](spark, SF))
    assert "CartesianProduct" not in s
    # count_triangles localCheckpoints its edge input (4 consumers), so
    # the full query's plan hides the scan subtree; pin the pushdown on
    # the edge relation itself — the exact plan the checkpoint's one
    # materialization job executes.
    from pyspark.sql import functions as F

    from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture

    li = (
        load_fixture(spark, SF, "lineitem")
        .filter(F.col("l_quantity") >= 48)
        .select("l_orderkey", "l_suppkey")
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst"))
        .distinct()
    )
    es = fmt(edges)
    pushed = [l for l in es.splitlines() if "PushedFilters" in l]
    assert any("l_quantity" in l for l in pushed), es
    assert "CartesianProduct" not in es


def test_pca_projection_stage_is_udf_free(spark):
    """The fit uses mapInPandas (allowed: sketch building); the serving
    projection must be pure codegen."""
    from etl_platform_nyc_taxi_spark.operators.linalg import project_pca
    import numpy as np

    from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture

    emb = load_fixture(spark, SF, "embeddings")
    d = len(emb.select("embedding").first()[0])
    s = fmt(
        project_pca(emb, "embedding", np.zeros(d), np.eye(2, d))
    )
    assert "ArrowEvalPython" not in s and "BatchEvalPython" not in s


# ---------------------------------------------------------------------------
# round-4 continuous-build additions
# ---------------------------------------------------------------------------


def test_tpch_q6_pushes_all_predicates_and_prunes(spark):
    """Q6's whole value is scan-boundedness: every filter must reach the
    parquet reader and the read schema must be the minimal column set."""
    s = fmt(QR.QUERIES["sql_tpch_q6"](spark, SF))
    pushed = s.split("PushedFilters:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
    read = s.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_tpch_q14_broadcasts_part_and_pushes_month(spark):
    s = fmt(QR.QUERIES["sql_tpch_q14"](spark, SF))
    assert "BroadcastHashJoin" in s
    pushed = s.split("PushedFilters:")[1].splitlines()[0]
    assert "l_shipdate" in pushed


def test_exists_late_ship_decorrelates_to_semi_join(spark):
    """The EXISTS subquery must plan as ONE semi-join pass, never a
    per-row subquery execution."""
    s = fmt(QR.QUERIES["sql_exists_late_ship"](spark, SF))
    assert "LeftSemi" in s, s
    assert "CartesianProduct" not in s and "BroadcastNestedLoop" not in s


def test_histogram_broadcasts_bounds_row(spark):
    """The (lo, hi) 1-row aggregate must broadcast against the scan —
    a shuffled join here would be wrong at any scale."""
    s = fmt(QR.QUERIES["histogram_totalprice"](spark, SF))
    assert "BroadcastNestedLoop" in s or "BroadcastHashJoin" in s


def test_skew_report_no_window_no_sort(spark):
    """Per-key counts reduce map-side; the summary must not plan a
    window or a global sort over the raw relation."""
    s = fmt(QR.QUERIES["skew_report"](spark, SF))
    assert "Window" not in s
    assert "Sort [" not in s.replace("SortAggregate", "")


def test_weighted_sample_single_window_exchange(spark):
    """Both window frames (running sum + per-key total) must share one
    exchange on the key — two shuffles would mean Catalyst split the
    frames."""
    import re

    s = fmt(QR.QUERIES["weighted_sample_pps"](spark, SF))
    assert len(re.findall(r"^\(\d+\) Exchange", s, re.M)) == 1, s


def test_activity_islands_distinct_before_window(spark):
    """The rank window must see DISTINCT (user, day) rows, not raw
    events: HashAggregate (the distinct) below the Window node."""
    s = fmt(QR.QUERIES["activity_islands"](spark, SF))
    win = s.find("Window")
    assert win != -1
    assert "HashAggregate" in s[:win], s[:win]


def test_graph_bfs_result_stays_int(spark):
    out = QR.QUERIES["graph_bfs"](spark, SF)
    assert dict(out.dtypes) == {"node": "bigint", "dist": "int"}


def test_scalar_subquery_decorrelates_to_aggregate_join(spark):
    """The correlated MAX must plan as one aggregate joined back —
    no per-row subquery, no nested-loop fallback."""
    s = fmt(QR.QUERIES["sql_scalar_subquery"](spark, SF))
    assert "HashAggregate" in s
    assert "CartesianProduct" not in s and "BroadcastNestedLoop" not in s


def test_regression_single_aggregate_pass(spark):
    """All six moments must come from ONE aggregate over one scan —
    re-reading the fact table per moment is the RDBMS trap."""
    import re

    s = fmt(QR.QUERIES["regression_price_qty"](spark, SF))
    assert len(re.findall(r"^\(\d+\) Scan parquet", s, re.M)) == 1, s


def test_moving_average_windows_above_aggregate(spark):
    """Both window frames run over the hourly AGGREGATE (grouped first),
    never the raw event stream."""
    s = fmt(QR.QUERIES["moving_average_hourly"](spark, SF))
    tree = s.split("(1) Scan")[0]  # the root-first tree rendering
    first_agg = tree.find("HashAggregate")
    first_win = tree.find("Window")
    assert first_agg != -1 and first_win != -1
    # root-first: the Window must appear ABOVE the aggregate feeding it
    assert first_win < first_agg, tree
    # both frames (ma3 + lag) share one Window node - same spec merged
    assert tree.count("Window") == 1, tree


def test_market_concentration_broadcasts_dims(spark):
    s = fmt(QR.QUERIES["market_concentration"](spark, SF))
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s


def test_abc_window_runs_on_part_aggregate(spark):
    """The global cumsum window must consume the part-level aggregate
    (dimension-bounded), never raw lineitem rows."""
    s = fmt(QR.QUERIES["abc_classification"](spark, SF))
    tree = s.split("(1) Scan")[0]
    # root-first tree: below the LAST (deepest) Window there must still
    # be a HashAggregate (the part-level reduce) before the scan
    below_deepest_window = tree.rsplit("Window", 1)[1]
    assert "HashAggregate" in below_deepest_window, tree


def test_tpch_q19_pushes_disjunction_bounds(spark):
    """The OR-of-ANDs must not defeat pushdown: brand and quantity
    bounds reach the scans; part broadcasts."""
    s = fmt(QR.QUERIES["sql_tpch_q19"](spark, SF))
    assert "BroadcastHashJoin" in s
    pushed_lines = [
        seg.splitlines()[0] for seg in s.split("PushedFilters:")[1:]
    ]
    assert any("l_quantity" in p_ for p_ in pushed_lines), pushed_lines
    assert any("p_brand" in p_ for p_ in pushed_lines), pushed_lines


def test_top_percent_windows_share_one_exchange(spark):
    import re

    s = fmt(QR.QUERIES["top_percent_orders"](spark, SF))
    # rank frame, count frame, and the final group-by all hash on the
    # same key: ONE exchange serves the whole plan (frames differ -
    # ordered vs whole-partition - so two Window nodes is correct; a
    # second shuffle would not be)
    assert len(re.findall(r"^\(\d+\) Exchange", s, re.M)) == 1, s


def test_embedding_dim_stats_single_aggregate_pass(spark):
    import re

    s = fmt(QR.QUERIES["embedding_dim_stats"](spark, SF))
    assert len(re.findall(r"^\(\d+\) Scan parquet", s, re.M)) == 1, s
    assert "Generate" in s  # posexplode stays codegen-side, no UDF
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_tpch_q7_broadcasts_dims_single_fact_shuffle(spark):
    s = fmt(QR.QUERIES["sql_tpch_q7"](spark, SF))
    assert "BroadcastHashJoin" in s
    pushed = [seg.splitlines()[0] for seg in s.split("PushedFilters:")[1:]]
    assert any("l_shipdate" in p_ for p_ in pushed), pushed


def test_tpch_q13_keeps_left_outer(spark):
    """The zero-order bucket requires LeftOuter (or RightOuter after
    Catalyst's side swap) to survive planning."""
    s = fmt(QR.QUERIES["sql_tpch_q13"](spark, SF))
    assert "LeftOuter" in s or "RightOuter" in s, s


def test_tpch_q15_plans_subquery_once(spark):
    """The MAX subquery must reuse the revenue aggregate, not rescan
    lineitem a third time: exactly 2 lineitem scans total (revenue CTE
    + subquery branch), never one per supplier row."""
    import re

    s = fmt(QR.QUERIES["sql_tpch_q15"](spark, SF))
    li_scans = len(re.findall(r"Location.*lineitem", s))
    assert li_scans <= 2, s


def test_tpch_q17_decorrelates_avg(spark):
    s = fmt(QR.QUERIES["sql_tpch_q17"](spark, SF))
    assert "HashAggregate" in s
    assert "CartesianProduct" not in s and "BroadcastNestedLoop" not in s


def test_lateral_topn_decorrelates_to_window_group_limit(spark):
    """The LATERAL ORDER BY+LIMIT must become a rank window with
    WindowGroupLimit (map-side top-k pre-truncation), never a per-row
    rescan of lineitem."""
    s = fmt(QR.QUERIES["sql_lateral_topn"](spark, SF))
    assert "WindowGroupLimit" in s, s
    assert len(re.findall(r"^\(\d+\) Scan parquet", s, re.M)) == 2, s


def test_window_value_family_single_window_node(spark):
    s = fmt(QR.QUERIES["window_value_family"](spark, SF))
    tree = s.split("(1) Scan")[0]
    assert tree.count("Window") == 1, tree


def test_dpp_partitioned_join_prunes_at_runtime(spark):
    """The partitioned-fact join must carry a dynamicpruning subquery in
    the fact scan's PartitionFilters — only qualifying day= directories
    are read. A dim whose filter references a second relation defeats
    the PartitionPruning rule (measured), so this pin also guards the
    dim's single-relation HAVING shape."""
    df = QR.QUERIES["dpp_partitioned_join"](spark, SF)
    s = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in s, s


def test_tfidf_cosine_pairs_df_cap_blocks_hot_terms(spark):
    """Terms above the document-frequency cap must not generate pairs:
    a term shared by every doc is pruned, so two docs overlapping ONLY
    in that term never pair; docs sharing rare terms do."""
    from etl_platform_nyc_taxi_spark.operators.text import tfidf_cosine_pairs

    docs = [
        (1, "common alpha beta gamma delta"),
        (2, "common alpha beta gamma epsilon"),
        (3, "common zeta eta theta iota"),
        (4, "common kappa lamda mu nu"),
        (5, "common xi omicron pi rho"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # cap at 60%: 'common' (df=5/5) pruned, everything else survives
    out = tfidf_cosine_pairs(df, threshold=0.3, df_cap_ppm=600_000).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (1, 2) in pairs          # share alpha/beta/gamma
    for p in pairs:
        assert p != (3, 4) and p != (4, 5) and p != (3, 5), pairs


def test_benford_pushes_filter_and_prunes_columns(spark):
    s = fmt(QR.QUERIES["benford_audit"](spark, SF))
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThanOrEqual(o_totalprice,1" in s, s
    m = re.search(r"ReadSchema: struct<([^>]*)>", s)
    assert m and m.group(1).split(",") == ["o_totalprice:double"], s


def test_rolling_active_users_broadcast_clip_no_nested_loop(spark):
    """Day-expansion plan: the observed-days clip must be a broadcast
    (semi) hash join on window_day; no nested-loop anywhere."""
    s = fmt(QR.QUERIES["rolling_active_users"](spark, SF))
    assert "BroadcastNestedLoop" not in s and "CartesianProduct" not in s, s
    assert "BroadcastHashJoin" in s, s


def test_tfidf_cosine_pairs_joins_are_hash_joins(spark):
    """The inverted-index self-join and the norm joins must all be hash
    joins on (term) / (id); the only nested-loop is the 1-row corpus-size
    bound broadcast."""
    s = fmt(QR.QUERIES["tfidf_cosine_pairs"](spark, SF))
    assert "CartesianProduct" not in s, s
    # every nested-loop must be the 1-row n_docs bound broadcast (the
    # subtree is re-executed per consumer, so it appears several times);
    # a nested-loop carrying the term relation would print its join keys
    tree_bnlj = re.findall(r"BroadcastNestedLoopJoin[^\n(]*", s)
    assert all("Inner BuildRight" in t or t == "BroadcastNestedLoopJoin"
               for t in tree_bnlj), tree_bnlj
    assert s.count("ShuffledHashJoin") + s.count("SortMergeJoin") + s.count(
        "BroadcastHashJoin"
    ) >= 3, s


def test_interarrival_single_shuffle_on_user(spark):
    """One lag window + one group-by, both keyed on user_id: exactly one
    user-keyed exchange feeds both (no second shuffle for the agg)."""
    s = fmt(QR.QUERIES["interarrival_stats"](spark, SF))
    assert len(re.findall(r"hashpartitioning\(user_id", s)) == 1, s


def test_temporal_join_scd2_equi_join_not_nested_loop(spark):
    """The point-in-time join must plan as an EQUI join on user_id with
    the range predicates as residual filters — a BroadcastNestedLoopJoin
    would mean the interval conditions ate the equi key (quadratic at
    scale)."""
    s = fmt(QR.QUERIES["temporal_join_scd2"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in s, s
    assert "CartesianProduct" not in s, s


def test_tpch_q21_decorrelates_both_exists(spark):
    """Q21's EXISTS + NOT EXISTS must decorrelate to left-semi and
    left-anti joins — never a per-row rescan or nested loop."""
    s = fmt(QR.QUERIES["sql_tpch_q21"](spark, SF))
    assert "LeftSemi" in s, s
    assert "LeftAnti" in s, s
    assert "CartesianProduct" not in s, s


def test_asof_forward_tol_single_user_shuffle(spark):
    """Tolerance is a post-projection: the forward as-of keeps the ONE
    union+window shuffle on user_id, no second exchange for the bound."""
    s = fmt(QR.QUERIES["join_asof_forward_tol"](spark, SF))
    assert len(re.findall(r"hashpartitioning\(user_id", s)) == 1, s


def test_neyman_allocation_single_corpus_pass(spark):
    """The corpus is aggregated once; all allocation math runs on the
    |sources|-row relation with a 1-row broadcast total."""
    s = fmt(QR.QUERIES["neyman_allocation"](spark, SF))
    # exactly one scan of documents (the per-stratum relation is
    # checkpointed before the scalar-total consumer)
    assert len(re.findall(r"Scan parquet(?:\s|\[)[^\n]*documents", s)) <= 1, s
    assert "BroadcastExchange" in s, s


def test_runtime_bloom_filter_on_shuffle_join(spark):
    """Runtime row-level filtering (the 100 TB selective fact-fact
    shape): when a join is too big to broadcast, Catalyst must inject a
    bloom-filter semi-filter from the selective side into the fact scan
    (might_contain over a BloomFilterAggregate subquery). At fixture
    scale the dim broadcasts and no filter is needed — so the test pins
    the behavior under the forced-shuffle config a real cluster would
    be in."""
    from pyspark.sql import functions as F

    from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_fixture(spark, SF, "lineitem")
        o = load_fixture(spark, SF, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        s = fmt(j)
        assert "might_contain" in s.lower(), s
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join (the engine enables it session-wide — session.py):
    a shuffle join whose one hot key owns ~95% of the fact side must
    come out of adaptive execution with the skewed partition SPLIT —
    SortMergeJoin(skew=true) + an AQEShuffleRead reading skewed splits —
    not one straggler task. Incompressible pad bytes keep the hot
    partition above the (lowered) skew threshold at test scale; at
    100 TB the default thresholds fire the same rule."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(0, 400_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.concat(
                F.md5(F.col("id").cast("string")),
                F.md5((F.col("id") + 1).cast("string")),
                F.md5((F.col("id") + 2).cast("string")),
            ).alias("pad"),
        )
        dim = spark.range(0, 400_000, 1000).select(
            F.col("id").alias("k"), F.lit("d").alias("dv")
        )
        j = fact.join(dim, "k", "left")
        assert len(j.collect()) == 400_000
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        s = buf.getvalue()
        assert "isFinalPlan=true" in s, s[-2000:]
        assert "skew=true" in s, s[-2000:]
        assert "skewed" in s, s[-2000:]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# Round-10 operator plan pins
# ---------------------------------------------------------------------------


def test_bloom_probe_broadcasts_positions_no_python(spark):
    """The Bloom positions relation must BROADCAST to the probe (the whole
    100 TB argument) and nothing in the pipeline may fall to Python."""
    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES

    s = fmt(QUERIES["bloom_decontaminate"](spark, SF))
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s
    assert "PythonEval" not in s and "BatchEvalPython" not in s


def test_blocklist_rules_broadcast(spark):
    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES

    s = fmt(QUERIES["domain_blocklist_filter"](spark, SF))
    assert "BroadcastHashJoin" in s
    assert "PythonEval" not in s and "BatchEvalPython" not in s


def test_nb_model_join_no_cartesian_beyond_classes(spark):
    """The class frame attaches via broadcast; the model join is equi on
    (cls, tok); no Python rows."""
    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES

    s = fmt(QUERIES["nb_quality_classifier"](spark, SF))
    assert "BroadcastHashJoin" in s
    assert "PythonEval" not in s and "BatchEvalPython" not in s


def test_unimax_window_sees_strata_not_corpus(spark):
    """The waterfilling window input must be the post-aggregate strata
    relation: a HashAggregate appears BELOW the Window in the plan."""
    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES

    s = fmt(QUERIES["unimax_allocation"](spark, SF))
    assert "Window" in s and "HashAggregate" in s
    # BELOW = the Window's input subtree, which formatted-explain prints
    # on later lines than the Window node itself (advisor r10: the old
    # `index(...) > -1` was vacuous — str.index never returns -1).
    assert "HashAggregate" in s[s.index("Window") :], (
        "no HashAggregate below the Window — the waterfilling window is "
        "seeing the raw corpus, not the per-stratum aggregate"
    )
    assert "PythonEval" not in s and "BatchEvalPython" not in s


def test_interleave_has_no_global_sort(spark):
    """Order keys are a projection — the plan must not contain a global
    Sort outside the per-source window (Exchange rangepartitioning would
    betray a global orderBy)."""
    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES

    s = fmt(QUERIES["dataset_interleave"](spark, SF))
    assert "rangepartitioning" not in s.lower()
    assert "PythonEval" not in s and "BatchEvalPython" not in s


def test_jaccard_prefix_join_no_cartesian(spark):
    """Candidates come from the prefix equi-join: the plan must carry NO
    cartesian/broadcast-nested-loop pair generation."""
    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES

    s = fmt(QUERIES["dedup_jaccard_exact"](spark, SF))
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    assert "PythonEval" not in s and "BatchEvalPython" not in s


def test_cdc_chunk_window_is_doc_partitioned(spark):
    """The chunk-id cumsum window partitions on the doc id — no global
    single-partition window over the corpus."""
    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES

    s = fmt(QUERIES["dedup_cdc_chunks"](spark, SF))
    import re

    specs = re.findall(r"windowspecdefinition\(([^,]+),", s)
    assert specs and all("__id" in sp for sp in specs), specs
    assert "PythonEval" not in s and "BatchEvalPython" not in s


def test_hybrid_rrf_global_rankers_take_ordered(spark):
    """The RRF rankers' global row_number windows must plan as
    TakeOrderedAndProject (LimitPushDownThroughWindow) — map-side top-k,
    not a full-corpus single-partition sort — and no Python rows."""
    s = fmt(QR.QUERIES["hybrid_search_rrf"](spark, SF))
    assert "TakeOrderedAndProject" in s
    assert "PythonEval" not in s and "BatchEvalPython" not in s


def test_matryoshka_truncated_ranker_take_ordered(spark):
    """Both brute-force rankings rank inside a per-query partition
    (no single-partition global sort of the corpus) and no Python rows
    anywhere (code-review r11: the first cut asserted only the Python
    half of its own name)."""
    s = fmt(QR.QUERIES["ann_matryoshka_eval"](spark, SF))
    assert "PythonEval" not in s and "BatchEvalPython" not in s
    assert "Window" in s
    # per-query windows: every Window partitions by query_id, so no
    # global rangepartitioning sort of the corpus exists in the plan
    assert "rangepartitioning" not in s.lower()


def test_bt_estimation_loop_is_single_row_fold(spark):
    """The Bradley-Terry MM loop must never shuffle: the items²-sized
    matrix collects into ONE row and every MM round is a projection
    mapping the strength map (r12 shape — the former per-round
    broadcast-join/checkpoint loop spent its whole wall on scheduler
    round-trips). No Python rows, no cartesian product, no shuffle
    join anywhere, and each round stays a SEPARATE projection column
    (map_from_arrays per round) so Catalyst analysis is linear in
    iters."""
    from etl_platform_nyc_taxi_spark.operators.preference import BT_ITERS

    s = fmt(QR.QUERIES["preference_bradley_terry"](spark, SF))
    assert "PythonEval" not in s and "BatchEvalPython" not in s
    assert "CartesianProduct" not in s
    assert "SortMergeJoin" not in s and "ShuffledHashJoin" not in s
    # one map per MM round survives in the plan
    assert s.count("map_from_arrays") >= BT_ITERS
    # the corpus-sized duel staging was folded into the checkpointed
    # matrix before the loop — the final plan sees only metadata scans
    assert "Scan parquet" not in s


def test_duel_staging_windows_are_blocked(spark):
    """Duel staging row_numbers inside (lang, id-block) sub-partitions —
    a global or per-lang-only sort would serialize at 100 TB."""
    from etl_platform_nyc_taxi_spark.operators.preference import stage_duels
    from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture

    d = load_fixture(spark, SF, "documents")
    s = fmt(stage_duels(d))
    assert re.search(r"hashpartitioning\(__g[^)]*__blk", s), (
        "window partitioning must include the id-block column"
    )


def test_l_diversity_cumulative_window_is_class_partitioned(spark):
    """The t-closeness cumulative window runs over 4-row class
    partitions, never a global order; corpus aggregates are map-side
    combinable (partial_count) and the band/total relations broadcast."""
    s = fmt(QR.QUERIES["l_diversity_audit"](spark, SF))
    assert "PythonEval" not in s and "BatchEvalPython" not in s
    assert "rangepartitioning" not in s.lower()
    assert "partial_count" in s
    assert "BroadcastExchange" in s


def test_triplet_mining_windows_are_anchor_partitioned(spark):
    """Both argmin reductions run inside per-anchor partitions (never a
    global sort of the pair relation) and no Python rows; the pair
    scorer is expression-only."""
    s = fmt(QR.QUERIES["triplet_mining"](spark, SF))
    assert "PythonEval" not in s and "BatchEvalPython" not in s
    assert "rangepartitioning" not in s.lower()
    assert re.search(r"hashpartitioning\(anchor_id", s)


def test_triplet_mining_ann_no_allpairs_negative_join(spark):
    """The LSH variant's negative candidates come from a bucket
    equi-join — the only non-equi join allowed in the plan is the
    anchors × cand_id inequality INSIDE candidate cells, never a
    corpus × corpus cartesian; signatures are the declared Arrow
    stage."""
    s = fmt(QR.QUERIES["triplet_mining_ann"](spark, SF))
    assert "CartesianProduct" not in s
    assert re.search(r"hashpartitioning\(anchor_id", s)
    # signature kernel is the one Arrow stage; no row-at-a-time Python
    assert "BatchEvalPython" not in s


def test_stupid_backoff_aggregates_partial_and_nv_broadcast(spark):
    """All n-gram count aggregates must be map-side combinable
    (partial_count) and the (N, V) scalar joins as a broadcast 1-row
    relation; no Python rows."""
    s = fmt(QR.QUERIES["lm_stupid_backoff"](spark, SF))
    assert "PythonEval" not in s and "BatchEvalPython" not in s
    assert "partial_count" in s
    assert "BroadcastExchange" in s


def test_heaps_cumsum_is_source_partitioned(spark):
    """The growth-curve cumsums run per source over the DOC-sized
    per-doc aggregate — partitioned window, no global sort, and the
    vocab first-occurrence agg is map-side combinable."""
    s = fmt(QR.QUERIES["heaps_law_fit"](spark, SF))
    assert "PythonEval" not in s and "BatchEvalPython" not in s
    assert "rangepartitioning" not in s.lower()
    assert re.search(r"hashpartitioning\(source", s)


def test_unigram_training_fold_has_no_python(spark):
    """The distributed Viterbi apply is pure expressions: no Python
    rows anywhere in the tokenize plan (the fold + constant cost map
    column live inside one projection)."""
    s = fmt(QR.QUERIES["unigram_tokenize"](spark, SF))
    assert "PythonEval" not in s and "BatchEvalPython" not in s


def test_markov_journey_windows_are_user_partitioned(spark):
    """Journey framing windows partition by user (never a global sort
    of events); the value-iteration plan folds the corpus-sized
    staging into the checkpointed transition relation (the BT-loop
    shape) and joins it via broadcast; no Python rows."""
    from etl_platform_nyc_taxi_spark.operators.analytics import (
        journey_transitions,
    )
    from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture

    j = fmt(journey_transitions(load_fixture(spark, SF, "events")))
    assert re.search(r"hashpartitioning\(u#", j)
    s = fmt(QR.QUERIES["attribution_markov"](spark, SF))
    assert "PythonEval" not in s and "BatchEvalPython" not in s
    assert "BroadcastExchange" in s
    assert "Scan parquet" not in s  # staging folded pre-iteration


def test_km_curve_windows_run_on_the_bucket_aggregate(spark):
    """The KM prefix-sum windows are the post-aggregate safe shape:
    they order the bucketed-duration relation, and the subject
    reductions are map-side combinable; no Python rows."""
    s = fmt(QR.QUERIES["survival_km"](spark, SF))
    assert "PythonEval" not in s and "BatchEvalPython" not in s
    assert "partial_count" in s or "partial_min" in s or "partial_sum" in s
    assert "BroadcastExchange" in s
