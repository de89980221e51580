"""One-command round-close checklist — runs the full verification
discipline in order and prints a single PASS/FAIL summary line:

  1. registry sanity (window = 50, dict order, every name oracled)
  2. full-registry differential verify (Spark vs DuckDB, sf0.01)
  3. flakiness probe over the ENTIRE driver window (two fresh JVMs each)
  4. whole-registry plan audit (python_eval must be 0)
  5. full bench at sf0.1 → BENCH_FULL.json
  6. baseline sweep (2× gate; --update-new for first-timers)

Usage: python tools/round_close.py [--skip-bench] [--skip-flake]

Each stage streams its own output; the tail line is machine-readable
JSON so automation (or the next session) can assert the round is
closeable without re-reading logs.
"""

from __future__ import annotations

import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")


def run(cmd: list[str]) -> tuple[int, str]:
    proc = subprocess.run(cmd, capture_output=True, text=True)
    return proc.returncode, proc.stdout + proc.stderr


def main() -> int:
    skip_bench = "--skip-bench" in sys.argv
    skip_flake = "--skip-flake" in sys.argv
    report: dict[str, object] = {}

    # 1. registry sanity
    from etl_platform_nyc_taxi_spark.queries_registry import (
        ORACLE_SQL,
        QUERIES,
        _VERIFY_FIRST,
    )

    ok_registry = (
        len(_VERIFY_FIRST) == 50
        and list(QUERIES)[:50] == _VERIFY_FIRST
        and all(n in ORACLE_SQL for n in QUERIES)
    )
    report["registry"] = {
        "queries": len(QUERIES),
        "window": len(_VERIFY_FIRST),
        "ok": ok_registry,
    }
    print(f"[1/6] registry: {len(QUERIES)} queries, window 50: {ok_registry}")

    # 2. full differential verify
    rc, out = run(
        [sys.executable, "tools/verify_local.py", "/root/testdata/sf0.01"]
    )
    tail = [ln for ln in out.splitlines() if "queries pass" in ln]
    report["verify"] = {"rc": rc, "tail": tail[-1] if tail else ""}
    print(f"[2/6] verify: rc={rc} {tail[-1] if tail else '??'}")

    # 3. window flakiness (two fresh JVMs per query)
    if skip_flake:
        report["flake"] = "skipped"
        print("[3/6] flakiness: skipped")
    else:
        rc_f, out_f = run(
            [
                sys.executable,
                "tools/flakiness_probe.py",
                "/root/testdata/sf0.01",
                *list(_VERIFY_FIRST),
            ]
        )
        tail_f = out_f.strip().splitlines()[-1] if out_f.strip() else ""
        report["flake"] = {"rc": rc_f, "tail": tail_f}
        print(f"[3/6] flakiness: rc={rc_f} {tail_f}")

    # 4. plan audit
    rc_p, out_p = run(
        [
            sys.executable,
            "tools/plan_report.py",
            "/root/testdata/sf0.001",
            "PLAN_AUDIT.json",
        ]
    )
    audit = json.load(open("PLAN_AUDIT.json"))
    # Fail LOUDLY on shape drift (advisor r10): a renamed key or a
    # restructured audit file must not let the gate pass vacuously by
    # summing an empty set to 0.
    if "queries" not in audit or not isinstance(audit["queries"], dict):
        raise SystemExit(
            "round_close: PLAN_AUDIT.json lacks the expected 'queries' "
            "dict — plan_report.py output shape changed; fix the gate"
        )
    per_query = audit["queries"]
    bad_shape = [
        n
        for n, v in per_query.items()
        if not isinstance(v, dict) or "python_eval" not in v
    ]
    if not per_query or bad_shape:
        raise SystemExit(
            "round_close: PLAN_AUDIT.json per-query rows missing the "
            f"'python_eval' key (first offenders: {bad_shape[:5]}) — "
            "the gate would be vacuous; fix plan_report.py or this gate"
        )
    pe_total = sum(v["python_eval"] for v in per_query.values())
    pe_ok = rc_p == 0 and pe_total == 0
    report["plan_audit"] = {"rc": rc_p, "python_eval_zero": pe_ok}
    print(f"[4/6] plan audit: rc={rc_p} python_eval_zero={pe_ok}")

    # 5 + 6. bench + sweep
    if skip_bench:
        report["bench"] = "skipped"
        print("[5/6] bench: skipped\n[6/6] sweep: skipped")
    else:
        rc_b, out_b = run([sys.executable, "bench.py"])
        bench_tail = [
            ln for ln in out_b.splitlines() if '"metric"' in ln
        ]
        report["bench"] = {"rc": rc_b, "tail": bench_tail[-1] if bench_tail else ""}
        print(f"[5/6] bench: rc={rc_b}")
        rc_s, out_s = run(
            [sys.executable, "tools/baseline_sweep.py", "--update-new"]
        )
        sweep_tail = out_s.strip().splitlines()[-1] if out_s.strip() else ""
        report["sweep"] = {"rc": rc_s, "tail": sweep_tail}
        print(f"[6/6] sweep: rc={rc_s} {sweep_tail}")

    hard_fail = (
        not ok_registry
        or report["verify"]["rc"] != 0  # type: ignore[index]
        or (not skip_flake and report["flake"]["rc"] != 0)  # type: ignore[index]
        or not report["plan_audit"]["python_eval_zero"]  # type: ignore[index]
        or (not skip_bench and (report["bench"]["rc"] != 0 or report["sweep"]["rc"] != 0))  # type: ignore[index]
    )
    report["closeable"] = not hard_fail
    print(json.dumps(report))
    return 1 if hard_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
