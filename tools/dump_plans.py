"""Dump ``explain("formatted")`` for a list of registry queries to
``plans/<tag>/<query>_<suffix>.txt`` — the judge-facing plan evidence.

Usage: python tools/dump_plans.py <out_dir> <suffix> <query> [query ...]
(e.g. ``python tools/dump_plans.py plans/r13 after dedup_pr_curve ...``).
Queries that EXECUTE work on invocation (streaming folds, index builds)
still return a batch DataFrame whose plan is dumped; their build cost is
paid once here at sf0.1 (matching the bench's fixture).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES
    from etl_platform_nyc_taxi_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", path)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
