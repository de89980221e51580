"""SparkSession factory.

The reference builds its session ad hoc in each job ``__main__`` with
``master("local[*]")``, AQE on, and parquet ``mergeSchema`` on
(reference: dags/spark_jobs/calculate_daily_transactions.py:115-127), and
never pins a timezone — making ``to_date`` results depend on the host TZ
(SURVEY.md defect D4). This factory centralizes those choices and pins UTC.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Session-level configs every engine session (and any externally provided
#: session, via :func:`pin_session_confs`) must carry for deterministic,
#: oracle-matchable results.
RUNTIME_CONFS: dict[str, str] = {
    # D4 fix: to_date()/window() on TIMESTAMP are session-TZ dependent.
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: shuffle-partition coalescing, skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Parquet TIMESTAMP(NANOS) (e.g. pandas/pyarrow default ns precision) is
    # rejected by Spark's reader; with this legacy conf the column surfaces
    # as int64 nanos and sources.parquet.read_parquet_auto() restores a
    # proper timestamp_ntz column (µs truncation, matching DuckDB/Arrow).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}

#: Configs that must be set before/at session build (not runtime-mutable).
BUILD_CONFS: dict[str, str] = {
    # Tolerate schema drift across monthly files (reference job 1 parity).
    "spark.sql.parquet.mergeSchema": "true",
    # Arrow for pandas UDF / applyInPandas / createDataFrame interchange.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # A long-lived session running hundreds of distinct queries generates
    # thousands of WholeStageCodegen classes; the JVM default code cache
    # (240 MB) fills, the JIT stops compiling, and everything afterwards
    # runs interpreted (observed as suite-tail queries 3-5× slower than
    # the same plan in a fresh JVM). Reserve more and let the sweeper
    # reclaim cold compiled code.
    "spark.driver.extraJavaOptions": (
        "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing"
    ),
}

#: Extra confs for LONG-LIVED sessions that run the materializing
#: operators back-to-back (scale_bench's ×10 soak): the iterative
#: operators (CC rounds, the LSH hot-bucket guard) pin localCheckpoint
#: blocks until their RDDs are garbage-collected, and the default
#: ContextCleaner periodic GC (30 min) lets such a session accumulate
#: gigabytes of dead blocks (measured: 36 s → 124 s for dedup_clusters
#: at ×10 data after the LSH family). A 1-minute periodic GC bounds
#: that — but it is NOT a default: a full GC on a 20 GiB heap pauses
#: seconds, and firing it on a timer lands those pauses inside other
#: queries' timed sections (measured in-suite: doc_winnow 0.8 s → 4.3 s
#: with this conf global). Benchmarks that need per-query hygiene do an
#: explicit collect-and-unpersist sweep OUTSIDE timed sections instead
#: (bench._gc_sweep).
SOAK_CONFS: dict[str, str] = {
    "spark.cleaner.periodicGC.interval": "1min",
}


def default_parallelism() -> int:
    """Local core budget: $SPARK_GRAFT_CPUS, else os.cpu_count()."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env and env.isdigit():
        return int(env)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "etl_platform_nyc_taxi_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard configs.

    On a real cluster, pass ``master=None`` and let spark-submit decide;
    locally this defaults to ``local[$SPARK_GRAFT_CPUS]``. Shuffle
    partitions default to the core budget — right-sized for local runs; a
    1000-executor deployment overrides via ``extra_confs`` (AQE coalescing
    then adapts downward at runtime).
    """
    cores = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_GRAFT_LOCAL" in os.environ or not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cores}]")

    confs = dict(BUILD_CONFS)
    confs.update(RUNTIME_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cores)
    # Sized for the local harness (32 cores against a 128 GiB box): the
    # storage pool must hold the largest materialized banded relation at
    # the biggest locally-tested scale with room for shuffle; on a real
    # cluster spark-submit owns this.
    confs.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g"))
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    pin_session_confs(spark)
    return spark


def pin_session_confs(spark: SparkSession) -> SparkSession:
    """Pin runtime-mutable determinism configs on an existing session.

    The verification driver constructs its own SparkSession and hands it to
    ``entry(spark)`` / ``queries()`` callables; those paths route through
    here so UTC + AQE hold regardless of who built the session.
    """
    for k, v in RUNTIME_CONFS.items():
        spark.conf.set(k, v)
    return spark
