"""Runtime filter eligibility: Catalyst's InjectRuntimeFilter rewrites a
selective build-side join into a bloom-filter pushdown on the probe-side
SCAN (`might_contain(...)` under the big side) — the 100 TB fact-fact
pruning mechanism. These tests pin that the engine's plans stay ELIGIBLE:
file-source scans with no UDF barrier between scan and join key.

Thresholds are production-scale (creation side < 10 MB, probe side scan
> 10 GB), so the tests lower them to observe the injection on fixtures.
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F


@contextlib.contextmanager
def _runtime_filter_confs(spark):
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtimeFilter.number.threshold": "10",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    old = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture
def fact_dim_paths(spark, tmp_path):
    fact = spark.range(0, 50_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("grp")
    )
    fp, dp = str(tmp_path / "fact"), str(tmp_path / "dim")
    fact.write.parquet(fp)
    dim.write.parquet(dp)
    return fp, dp


def test_bloom_runtime_filter_injected_on_probe_scan(spark, fact_dim_paths):
    fp, dp = fact_dim_paths
    with _runtime_filter_confs(spark):
        fact = spark.read.parquet(fp)
        dim = spark.read.parquet(dp).filter(F.col("grp") == 7)  # selective build
        j = fact.join(dim, "k")
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
        # Correctness unchanged by the injected filter: 20 dim keys × 50.
        assert j.count() == 20 * 50


def test_registry_join_plans_stay_eligible(spark, fact_dim_paths):
    """A Python-UDF projection between scan and join key would silently
    disable injection (the scan can't absorb the filter). Pin that a
    codegen-only derived key keeps the rewrite alive."""
    fp, dp = fact_dim_paths
    with _runtime_filter_confs(spark):
        fact = spark.read.parquet(fp).withColumn("k2", F.col("k") + 0)
        dim = spark.read.parquet(dp).filter(F.col("grp") == 7)
        j = fact.join(dim.withColumnRenamed("k", "k2"), "k2")
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
