"""Per-fold cost profile for the corpus-ingest admission fold
(VERDICT r11 task 3's done-clause: per-batch cost must stay FLAT as the
ledger grows, now that admission carries per-stratum counters instead
of windowing the full accumulated ledger).

Drives :func:`streaming.ingest.make_ingest_fold` directly over N
equal-size, doc_id-ascending waves of the ×10 corpus (static context
built once, exactly as inside the stream) and records each fold's wall
clock next to the ledger size it folded into.

A second, asymptotic series isolates the ADMISSION piece task 3
replaced: the retired per-fold computation (``admit_ledger``'s
cumulative window over the full accumulated ledger) timed at the final
ledger replicated ×1/×10/×100, next to the carried-counter path
(``admit_arrivals_incremental`` of one wave against the strata-sized
counters) at the same three ledger sizes — the former grows with the
ledger, the latter never reads it.

Usage: python tools/ingest_flat_probe.py [n_waves] [sf_dir] [out_json]
Appends the profile to SCALE_BENCH.json under "ingest_fold_profile".
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    n_waves = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_scale/x10"
    out_json = sys.argv[3] if len(sys.argv) > 3 else "SCALE_BENCH.json"

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from etl_platform_nyc_taxi_spark.operators.sampling import (
        unimax_allocation,
    )
    from etl_platform_nyc_taxi_spark.operators.text import (
        QualityRules,
        token_count,
    )
    from etl_platform_nyc_taxi_spark.session import SOAK_CONFS, get_spark
    from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture
    from etl_platform_nyc_taxi_spark.streaming.cdc import CdcState
    from etl_platform_nyc_taxi_spark.streaming.ingest import (
        LEDGER_COLS,
        admit_ledger,
        make_ingest_fold,
    )

    spark = get_spark("ingest_flat_probe", extra_confs=SOAK_CONFS)
    spark.sparkContext.setLogLevel("ERROR")

    d = load_fixture(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 4 != 0).select(
        "doc_id", "text", "lang", "source"
    )
    arriving = (
        d.filter(F.col("doc_id") % 4 == 0)
        .select("doc_id", "text", "lang", "source")
        .withColumn("__w", F.ntile(n_waves).over(Window.orderBy("doc_id")))
        .localCheckpoint(eager=True)
    )
    eval_slice = corpus.filter(F.col("doc_id") % 5 == 0)
    sizes = corpus.groupBy("lang").agg(
        F.sum(token_count("text")).cast("long").alias("n_tok")
    )
    budget = sizes.agg(
        F.expr("CAST(sum(n_tok) div 8 AS LONG)").alias("budget")
    )
    alloc = unimax_allocation(sizes, ["lang"], epoch_cap=1, budget=budget)

    state_dir = tempfile.mkdtemp(prefix="flatprobe_state_")
    state = CdcState(spark, state_dir)
    fold = make_ingest_fold(
        corpus, eval_slice, alloc, state,
        rules=QualityRules(min_tokens=40, min_stopword_ratio=0.05),
        partitions=spark.sparkContext.defaultParallelism,
        strata_cols=["lang"],
        flag_pct=35,
    )

    from etl_platform_nyc_taxi_spark.streaming.ingest import (
        admit_arrivals_incremental,
        counters_of_ledger,
    )

    waves_s, ledger_rows = [], []
    admission = {"ledger_rows": [], "window_recompute_s": [],
                 "carried_counters_s": []}
    try:
        for w in range(1, n_waves + 1):
            batch = arriving.filter(F.col("__w") == w).drop("__w")
            t0 = time.perf_counter()
            fold(batch, w)
            waves_s.append(round(time.perf_counter() - t0, 3))
            ledger_rows.append(state.read().count())
            print(f"wave {w}: fold={waves_s[-1]}s ledger={ledger_rows[-1]}",
                  flush=True)

        # asymptotic admission comparison at ledger ×1/×10/×100
        led = state.read().select(*LEDGER_COLS).localCheckpoint(eager=True)
        last_gates = (
            led.join(
                arriving.filter(F.col("__w") == n_waves).select("doc_id"),
                "doc_id",
            )
            .select(*LEDGER_COLS)
            .localCheckpoint(eager=True)
        )
        for mult in (1, 10, 100):
            big = led
            if mult > 1:
                parts = [
                    led.withColumn(
                        "doc_id", F.col("doc_id") + F.lit(r * 100_000_000)
                    )
                    for r in range(mult)
                ]
                big = parts[0]
                for prt in parts[1:]:
                    big = big.unionByName(prt)
                big = big.localCheckpoint(eager=True)
            n = big.count()
            t0 = time.perf_counter()
            admit_ledger(big, alloc, ["lang"]).write.format(
                "noop"
            ).mode("overwrite").save()
            win_s = round(time.perf_counter() - t0, 3)
            ctr = counters_of_ledger(big, ["lang"]).localCheckpoint(
                eager=True
            )
            t0 = time.perf_counter()
            admit_arrivals_incremental(
                last_gates, ctr, alloc, ["lang"]
            ).write.format("noop").mode("overwrite").save()
            inc_s = round(time.perf_counter() - t0, 3)
            admission["ledger_rows"].append(n)
            admission["window_recompute_s"].append(win_s)
            admission["carried_counters_s"].append(inc_s)
            print(f"admission @ ledger={n}: window={win_s}s "
                  f"counters={inc_s}s", flush=True)
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)

    profile = {
        "sf_dir": sf_dir,
        "n_waves": n_waves,
        "fold_s": waves_s,
        "ledger_rows": ledger_rows,
        "admission_asymptotics": admission,
    }
    if os.path.exists(out_json):
        doc = json.load(open(out_json))
        doc["ingest_fold_profile"] = profile
        json.dump(doc, open(out_json, "w"), indent=1, sort_keys=True)
    print(json.dumps(profile))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
