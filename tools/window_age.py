"""Driver-window rotation hygiene: compute each query's last driver-green
round from CORRECTNESS_r*.json and report the age table the rotation
policy needs (VERDICT r5 task 6) — who is in the current window, who has
never been sampled, and who breaches the staleness rule at the NEXT
round.

The staleness rule (amended r11, VERDICT r10 task 1): with a fixed
50-slot driver window over an N-query registry, the tightest cadence any
rotation can achieve is ceil(N / 50) rounds, so the rule is "no
driver-green older than ceil(N/50) rounds" — computed from the live
registry size, not hard-coded (the original 2-round rule became
arithmetically unsatisfiable once the registry passed 100 queries).
The COMPENSATING CONTROL for the longer driver cadence is the
round-close full-registry differential verify (tools/verify_local.py —
every query, Spark vs DuckDB, value-hashed) which runs every round via
tools/round_close.py; the driver window rotates oldest-first on top so
every query still gets a periodic DRIVER-side proof.

Usage: python tools/window_age.py [--round N]
  --round N: the upcoming round number (default: max seen + 1).

Output: one human table on stdout plus a machine-readable JSON tail line
so round-close automation can assert the backlog size.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_history(
    repo_dir: str,
) -> tuple[dict[str, int], dict[str, int], dict[str, bool], int]:
    """Return (last_green, last_sampled, latest_verdict, max_round) per
    query name. ``latest_verdict[name]`` is the green/red outcome of the
    most RECENT sample — a query green in r2 but red in r4 must surface
    as a standing failure, not as ordinary staleness."""
    last_green: dict[str, int] = {}
    last_sampled: dict[str, int] = {}
    latest_verdict: dict[str, bool] = {}
    max_round = 0
    for path in sorted(glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        rows = json.load(open(path))
        for name, row in rows.items():
            ok = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            if rnd >= last_sampled.get(name, 0):
                latest_verdict[name] = ok
            last_sampled[name] = max(last_sampled.get(name, 0), rnd)
            if ok:
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green, last_sampled, latest_verdict, max_round


def main() -> int:
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    upcoming = None
    if "--round" in sys.argv:
        upcoming = int(sys.argv[sys.argv.index("--round") + 1])

    from etl_platform_nyc_taxi_spark.queries_registry import (
        _VERIFY_FIRST,
        QUERIES,
    )

    last_green, last_sampled, latest_verdict, max_round = load_history(repo_dir)
    if upcoming is None:
        upcoming = max_round + 1

    window = set(_VERIFY_FIRST)
    all_names = list(QUERIES)
    never = [n for n in all_names if n not in last_sampled]
    sampled_never_green = [
        n for n in all_names if n in last_sampled and n not in last_green
    ]
    red_at_latest = [
        n
        for n in all_names
        if n in last_sampled
        and not latest_verdict.get(n, True)
        and n in last_green  # never-green already reported separately
    ]
    # Age = rounds since last green as of the END of the upcoming round.
    # Staleness bound = the achievable rotation cycle: ceil(N / window).
    # By end of round R, last green must be >= R - cycle.
    cycle = -(-len(all_names) // max(len(_VERIFY_FIRST), 1))

    def age(n: str) -> int | None:
        return upcoming - last_green[n] if n in last_green else None

    breaches = sorted(
        (
            (age(n), n)
            for n in all_names
            if n in last_green and age(n) > cycle and n not in window
        ),
        reverse=True,
    )
    covered = [
        n
        for n in all_names
        if n in last_green and age(n) > cycle and n in window
    ]

    print(
        f"registry: {len(all_names)}  window: {len(_VERIFY_FIRST)}"
        f"  cycle bound: {cycle} rounds"
    )
    print(f"upcoming round: r{upcoming} (history through r{max_round})")
    print(f"\nnever driver-sampled: {len(never)}")
    in_win = [n for n in never if n in window]
    out_win = [n for n in never if n not in window]
    print(f"  in current window (get a row r{upcoming}): {len(in_win)}")
    print(f"  NOT in window (backlog after r{upcoming}): {len(out_win)}")
    for n in out_win:
        print(f"    {n}")
    if sampled_never_green:
        print(f"\nSAMPLED BUT NEVER GREEN (fix first!): {sampled_never_green}")
    if red_at_latest:
        print(
            "\nREGRESSED — red at latest sample despite an older green"
            f" (fix + re-window first!): "
            + ", ".join(
                f"{n} (green r{last_green[n]}, red r{last_sampled[n]})"
                for n in red_at_latest
            )
        )
    print(
        f"\nstaleness-rule breaches at end of r{upcoming}"
        f" (last green <= r{upcoming - cycle - 1}, not in window):"
        f" {len(breaches)}"
    )
    for a, n in breaches:
        print(f"    {n}  (last green r{upcoming - a}, age {a})")
    if covered:
        print(f"\nstale-but-in-window (re-green this round): {len(covered)}")
        for n in covered:
            print(f"    {n}  (last green r{last_green[n]})")
    print(
        json.dumps(
            {
                "upcoming_round": upcoming,
                "registry": len(all_names),
                "cycle_bound": cycle,
                "never_sampled_total": len(never),
                "backlog_after_round": len(out_win),
                "sampled_never_green": sampled_never_green,
                "red_at_latest": red_at_latest,
                "rule_breaches": [n for _, n in breaches],
                "stale_in_window": covered,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
