"""Whole-registry physical-plan audit → PLAN_AUDIT.json.

For every registry query, record the plan-quality facts the engine's
design rules promise (tests/test_plans.py pins the critical ones;
this report makes ALL of them inspectable at once):

* ``exchanges``        — shuffle count (lower is better; joins/aggs need one)
* ``broadcast_joins``  — dimension joins that correctly broadcast
* ``sortmerge_joins``  — shuffle joins (expected only fact⋈fact)
* ``cartesian``        — cross products (0 everywhere except declared
                         1-row bound-broadcasts)
* ``python_eval``      — row-at-a-time Python UDF nodes (must be 0)
* ``arrow_stages``     — vectorized Python stages (mapInPandas /
                         pandas_udf / applyInPandasWithState — the
                         declared exceptions: multimodal kernels, LSH
                         signature matmul, stateful sessionize)
* ``scans`` / ``pushed``— parquet scans and whether any carries pushed
                         filters
* ``codegen_spans``    — WholeStageCodegen regions (JVM-compiled spans)

Queries that EXECUTE work on invocation (streaming runs, index builds)
still return a batch DataFrame whose plan is audited; their build cost
is paid once here at sf0.001.

Usage: python tools/plan_report.py [sf_dir] [out_json]
"""

from __future__ import annotations

import contextlib
import io
import json
import re
import sys

sys.path.insert(0, "/root/repo")


def audit_plan(df) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    s = buf.getvalue()

    def nodes(name: str) -> int:
        return len(re.findall(rf"^\(\d+\) {name}", s, re.M))

    pushed = [seg.splitlines()[0].strip() for seg in s.split("PushedFilters:")[1:]]
    return {
        "exchanges": nodes("Exchange"),
        "broadcast_joins": nodes("BroadcastHashJoin"),
        "sortmerge_joins": nodes("SortMergeJoin"),
        "shuffledhash_joins": nodes("ShuffledHashJoin"),
        "cartesian": nodes("CartesianProduct")
        + nodes("BroadcastNestedLoopJoin"),
        "python_eval": nodes("BatchEvalPython"),
        "arrow_stages": nodes("ArrowEvalPython")
        + nodes("MapInPandas")
        + nodes("FlatMapGroupsInPandas")
        + nodes("FlatMapGroupsInPandasWithState"),
        "scans": nodes("Scan parquet"),
        "pushed_any": any(p and p != "[]" for p in pushed),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", s))),
        "windows": nodes("Window"),
        "sorts": nodes("Sort"),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLAN_AUDIT.json"

    from etl_platform_nyc_taxi_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("plan_report")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    for name, fn in entrymod.queries().items():
        try:
            report[name] = audit_plan(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — record, keep auditing
            report[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}

    totals = {
        "queries": len(report),
        "errors": sum(1 for v in report.values() if "error" in v),
        "python_eval_total": sum(
            v.get("python_eval", 0) for v in report.values()
        ),
        "cartesian_total": sum(v.get("cartesian", 0) for v in report.values()),
        "arrow_stage_queries": sorted(
            n for n, v in report.items() if v.get("arrow_stages", 0) > 0
        ),
        "cartesian_queries": sorted(
            n for n, v in report.items() if v.get("cartesian", 0) > 0
        ),
    }
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "totals": totals, "queries": report}, f, indent=1, sort_keys=True)
    print(json.dumps(totals))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
