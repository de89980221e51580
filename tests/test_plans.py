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
