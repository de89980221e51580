"""Run-to-run determinism probe: execute each named query's SPARK side in
TWO fresh JVMs (subprocess per pass) and compare order-insensitive value
multisets. The driver gate runs once per round, so a query that is
correct-but-flaky (float accumulation order, trained-model drift,
session-state leakage) would blink red across rounds without ever
failing locally — this tool catches that class before the driver does.

Usage: python tools/flakiness_probe.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def _hash_queries(names: list[str], sf_dir: str) -> dict[str, str]:
    from verify_local import df_multiset

    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES
    from etl_platform_nyc_taxi_spark.session import get_spark

    spark = get_spark("flake_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for n in names:
        df = QUERIES[n](spark, sf_dir)
        cols, rows = df_multiset(df.columns, [tuple(r) for r in df.collect()])
        out[n] = hashlib.sha256(repr((cols, rows)).encode()).hexdigest()
    spark.stop()
    return out


def main() -> int:
    if sys.argv[1] == "--once":
        sf_dir = sys.argv[2]
        print(json.dumps(_hash_queries(sys.argv[3:], sf_dir)))
        return 0
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    if not names:
        print("no queries given")
        return 2

    def run_pass():
        proc = subprocess.run(
            [sys.executable, __file__, "--once", sf_dir, *names],
            capture_output=True,
            text=True,
            check=True,
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    a, b = run_pass(), run_pass()
    bad = [n for n in names if a[n] != b[n]]
    for n in names:
        print(("FLAKY " if n in bad else "STABLE ") + n)
    print(f"\n{len(names) - len(bad)}/{len(names)} stable")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
