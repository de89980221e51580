"""2x-rule sweep: BENCH_FULL.json vs BASELINE_RECORD.json (VERDICT r6
task 4 — one consistent machine-readable baseline of record per query,
so per-round perf grading stops diffing tables against prose).

Usage: python tools/baseline_sweep.py [--update-new]

Prints every query whose in-suite bench reading exceeds 2x its baseline
of record (exit 1 if any), plus the totals ratio. Queries in the
suite-noise class (src isolated-*) get a reminder to re-measure
isolated before calling a breach. ``--update-new`` appends baselines
for queries present in BENCH_FULL but missing from the record (baseline
= this first recorded run, src = first-suite), keeping the record
complete as the registry grows.
"""

from __future__ import annotations

import json
import sys

RECORD = "BASELINE_RECORD.json"
BENCH = "BENCH_FULL.json"


def main() -> int:
    rec = json.load(open(RECORD))
    bench = json.load(open(BENCH))
    if bench.get("sf") != rec.get("sf"):
        print(f"sf mismatch: bench {bench.get('sf')} vs record {rec.get('sf')}")
        return 2
    bq, rq = bench["queries"], rec["queries"]

    new = sorted(set(bq) - set(rq))
    if "--update-new" in sys.argv and new:
        for q in new:
            rq[q] = {"s": round(float(bq[q]), 3), "src": "first-suite"}
        json.dump(rec, open(RECORD, "w"), indent=1, sort_keys=True)
        print(f"recorded first-suite baselines for: {', '.join(new)}")
    elif new:
        print(f"NOT in record (run --update-new): {', '.join(new)}")

    breaches, minor = [], []
    for q in sorted(set(bq) & set(rq)):
        base, now = rq[q]["s"], bq[q]
        if base > 0 and now / base > 2.0:
            # Sub-second rows swing up to ~2.5x with suite POSITION
            # alone (cold-start vs warm zone; see record note) — a
            # hard breach needs real absolute damage too.
            if now - base < 1.0:
                minor.append((now / base, q, base, now))
            else:
                noisy = rq[q]["src"].startswith("isolated")
                breaches.append((now / base, q, base, now, noisy))
    for r, q, base, now, noisy in sorted(breaches, reverse=True):
        hint = "  [suite-noise class: confirm with isolate_query_bench]" if noisy else ""
        print(f"BREACH {r:4.2f}x  {q}: base {base} now {now}{hint}")
    for r, q, base, now in sorted(minor, reverse=True):
        print(f"minor  {r:4.2f}x  {q}: base {base} now {now}"
              "  [sub-second position noise unless isolated median breaches]")

    tb = sum(rq[q]["s"] for q in set(bq) & set(rq))
    tn = sum(bq[q] for q in set(bq) & set(rq))
    print(f"totals: bench {tn:.1f}s vs record {tb:.1f}s = {tn / tb:.2f}x"
          f"  ({len(breaches)} breaches over {len(set(bq) & set(rq))} queries)")
    return 1 if breaches else 0


if __name__ == "__main__":
    raise SystemExit(main())
