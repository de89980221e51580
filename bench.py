"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes through a `noop` write — the full physical plan runs
(scan → shuffles → final projection) without driver-side collect, so the
number measures engine throughput, not Py4J row transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _gc_sweep(spark) -> None:
    """Per-query isolation, OUTSIDE the timed section: synchronously
    unpersist every leftover persistent RDD (localCheckpoint blocks from
    the LSH banded relations and CC round state), clear the SQL cache,
    then one explicit JVM GC. Deterministic teardown beats both async
    ContextCleaner draining and a periodic GC timer — the timer fires
    full-heap pauses INSIDE other queries' timed sections (measured:
    doc_winnow 0.8 s → 4.3 s in-suite with periodicGC=1min)."""
    import gc

    gc.collect()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    it = jmap.entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(True)  # blocking: blocks are gone now
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(0.5)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_platform_nyc_taxi_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # Optional session recycling (SPARK_GRAFT_BENCH_RECYCLE=K restarts
    # the session every K queries). Default OFF: measured on this suite,
    # in-process restarts degrade the shared JVM monotonically (class /
    # code-cache churn across 88 sessions drove dedup_minhash_lsh from
    # ~4 s isolated to 51 s by suite end at K=1). The deterministic
    # unpersist sweep in _gc_sweep is the supported hygiene mechanism.
    recycle_every = int(os.environ.get("SPARK_GRAFT_BENCH_RECYCLE", "0"))

    # Untimed warmup (VERDICT r7 task 6): the suite runs in registry
    # order and the verification-window rotation reorders that every
    # round, so whichever queries rotate to the head used to absorb the
    # JVM cold-start (codegen compiler, classloader, parquet footer
    # caches) and read 1.5-2.5x hot vs their record — position noise
    # polluting round-over-round comparisons (SCALING.md lesson 3).
    # Burn the cold-start on a fixed trio of cheap, diverse plans
    # (scan+project, shuffle agg, documents-table expression work)
    # BEFORE any timing starts.
    for wname in ("scan_project", "daily_transactions", "text_stats"):
        wfn = queries.get(wname)
        if wfn is not None:
            wfn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    _gc_sweep(spark)

    timings: dict[str, float] = {}
    for i, (name, fn) in enumerate(queries.items()):
        if recycle_every and i and i % recycle_every == 0:
            spark.stop()
            spark = get_spark("bench")
            spark.sparkContext.setLogLevel("ERROR")
        _gc_sweep(spark)  # measure this query, not its predecessors' debris
        # Min of two timed runs serves BOTH purposes that used to need a
        # third (dedicated warm) execution: run 1 absorbs cold costs
        # (plan compile, codegen, index/quantizer builds cached per
        # sf_dir) and run 2 is warm by construction, so min() reports
        # the warm cost. The min is also the standard estimator of
        # intrinsic cost under external noise (the sandboxed host shows
        # multi-x load spikes from OUTSIDE the guest: loadavg 13+ with
        # zero local processes; a suite tail inflated 10-20x in one run
        # and not the next). At 138 queries the dropped warm pass cuts
        # ~1/3 of suite executions.
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = sf
    full = {
        "metric": "total wall-clock, all declared queries (noop sink, warm)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_num,
    }
    # The driver captures only the tail of stdout (~2 KB), and at 180
    # queries the full per-query map exceeds it (BENCH_r04.json parsed as
    # null). Persist the full map in-repo, print it for humans, then emit
    # a compact summary as the FINAL line so the tail capture always
    # contains one complete, parseable JSON object.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo_dir, "BENCH_FULL.json"), "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(full))
    compact = {k: full[k] for k in ("metric", "value", "unit", "sf")}
    compact["n_queries"] = len(timings)
    compact["queries_file"] = "BENCH_FULL.json"
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
