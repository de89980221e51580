"""Profile one registry query: run in a fresh session with the UI on,
then dump per-stage executorRunTime and per-SQL-execution wall time from
the REST API, sorted by cost.

Usage: python tools/profile_query.py <query> [sf_dir]
"""
from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from etl_platform_nyc_taxi_spark.queries_registry import QUERIES
    from etl_platform_nyc_taxi_spark.session import get_spark

    spark = get_spark("profile", extra_confs={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[name]

    # warm run (plan compile, codegen, per-sf caches)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def get(path):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
            return json.load(r)

    # record boundary: stages/jobs/sql before timed run
    pre_stages = {s["stageId"] for s in get("/stages")}
    pre_sql = {q["id"] for q in get("/sql?length=10000")}

    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    stages = [s for s in get("/stages") if s["stageId"] not in pre_stages]
    sqls = [q for q in get("/sql?length=10000") if q["id"] not in pre_sql]

    print(f"=== {name} timed run: {wall:.3f}s wall ===")
    tot_run = sum(s.get("executorRunTime", 0) for s in stages)
    print(f"total executorRunTime {tot_run/1000:.2f}s across {len(stages)} stages")
    srt = sorted(stages, key=lambda s: -s.get("executorRunTime", 0))
    for s in srt[:25]:
        print(
            f"  stage {s['stageId']:4d} run={s.get('executorRunTime',0)/1000:7.2f}s "
            f"cpu={s.get('executorCpuTime',0)/1e9:7.2f}s tasks={s.get('numCompleteTasks',0):4d} "
            f"in={s.get('inputBytes',0)/1e6:8.1f}MB sh_r={s.get('shuffleReadBytes',0)/1e6:8.1f}MB "
            f"sh_w={s.get('shuffleWriteBytes',0)/1e6:8.1f}MB  {s.get('description','')[:80]}"
        )
    print(f"--- SQL executions: {len(sqls)} ---")
    for q in sorted(sqls, key=lambda q: -q.get("duration", 0))[:30]:
        print(f"  sql {q['id']:4d} dur={q.get('duration',0)/1000:7.2f}s  {q.get('description','')[:100]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
