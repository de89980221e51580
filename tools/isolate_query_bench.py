"""Isolated re-measurement of one registry query (VERDICT r3 task 4).

In-suite bench timings share one JVM with 69 other queries — GC pressure,
code-cache churn, and AQE statistics from earlier queries all leak into a
single measurement. This tool times ONE query in a fresh session: N
timed runs after one warm-up, reporting min/median/mean so a suite-noise
regression can be separated from a real plan regression.

Usage: python tools/isolate_query_bench.py <query> [runs] [sf_dir]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES
    from etl_platform_nyc_taxi_spark.session import get_spark

    spark = get_spark("isolate_bench")
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[name]

    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))

    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "runs": times,
                "min": min(times),
                "median": statistics.median(times),
                "mean": round(statistics.mean(times), 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
