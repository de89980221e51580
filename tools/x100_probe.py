"""×100 probe for the LSH pair-work tail (VERDICT r11 task 5).

The two queries whose ×10 trend most wanted a second data point —
``dedup_minhash_lsh`` (8.77× at ×10, pair_work-bound) and
``dedup_image`` (unguarded pair_work 2.2M → 252M at ×10) — timed at a
deterministic ×100 synthesis of sf0.1 (same tools/scale_bench.synthesize
corpus construction, so ratios compose with the existing ×10 rows), plus
the bucket-occupancy evidence that makes the ``max_bucket=128`` default
defensible at the next order of magnitude: the UNGUARDED candidate-pair
integral vs the bound the salt_hot_buckets guard enforces
(tools/bucket_probe.guarded_pair_work), at ×10 and ×100.

Usage: python tools/x100_probe.py [out_json]
Writes one JSON document (default X100_PROBE.json) and prints it.
Timing protocol matches tools/scale_bench.py: fresh JVM per query via
``--one`` subprocesses (warm pass + min of 2 timed runs).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = ["dedup_minhash_lsh", "dedup_image"]
BASE = "/root/testdata/sf0.1"
X10 = "/tmp/spark_graft_scale/x10"
X100 = "/tmp/spark_graft_scale/x100"
CAP = 128


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "X100_PROBE.json"

    from etl_platform_nyc_taxi_spark.session import SOAK_CONFS, get_spark
    from tools.bucket_probe import PROBES, guarded_pair_work, histogram
    from tools.scale_bench import synthesize

    spark = get_spark("x100_probe", extra_confs=SOAK_CONFS)
    spark.sparkContext.setLogLevel("ERROR")

    for factor, d in ((10, X10), (100, X100)):
        if not os.path.exists(d):
            t0 = time.perf_counter()
            synthesize(spark, BASE, d, factor)
            print(f"synthesized x{factor} in {time.perf_counter()-t0:.0f}s",
                  flush=True)

    report: dict = {"cap": CAP, "queries": {}, "buckets": {}}
    # bucket evidence first (shares the probe session); timing runs in
    # fresh JVMs afterwards so it never measures this session's debris
    for name in QUERIES:
        probe = PROBES[name]
        report["buckets"][name] = {}
        for tag, d in (("base", BASE), ("x10", X10), ("x100", X100)):
            banded = probe(spark, d).localCheckpoint(eager=True)
            h = histogram(banded)
            h["guarded_pair_work"] = guarded_pair_work(banded, CAP)
            banded.unpersist()
            report["buckets"][name][tag] = h
            print(f"buckets {name}/{tag}: pair_work={h['pair_work']} "
                  f"guarded={h['guarded_pair_work']} max_c={h['max_bucket']}",
                  flush=True)
    spark.stop()

    scale_bench = os.path.join(os.path.dirname(__file__), "scale_bench.py")

    def one(name: str, d: str) -> float:
        p = subprocess.run(
            [sys.executable, scale_bench, "--one", name, d],
            capture_output=True, text=True, check=True,
        )
        return float(p.stdout.strip().splitlines()[-1])

    for name in QUERIES:
        b = one(name, BASE)
        s10 = one(name, X10)
        s100 = one(name, X100)
        report["queries"][name] = {
            "base_s": b,
            "x10_s": s10,
            "x100_s": s100,
            "ratio_x10": round(s10 / max(b, 1e-9), 2),
            "ratio_x100": round(s100 / max(b, 1e-9), 2),
            "ratio_x100_vs_x10": round(s100 / max(s10, 1e-9), 2),
        }
        print(f"{name}: base={b}s x10={s10}s x100={s100}s", flush=True)

    with open(out_json, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report["queries"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
