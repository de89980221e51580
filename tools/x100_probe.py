"""×100 probe for the LSH pair-work tail (VERDICT r11 task 5).

The two queries whose ×10 trend most wanted a second data point —
``dedup_minhash_lsh`` (8.77× at ×10, pair_work-bound) and
``dedup_image`` (unguarded pair_work 2.2M → 252M at ×10).

Two corpora, because the question has two parts:

* **v1 (tools/scale_bench.synthesize — the corpus every SCALE_BENCH row
  uses)** — bucket-occupancy evidence. The constant per-replica word
  suffix concentrates a shared 6-gram family inside each replica (the
  r6 SCALING.md post-mortem), so candidate mass grows SUPERLINEARLY
  with replica count: a synthesis artifact, not operator behavior.
* **v2 (``synthesize_v2``)** — same construction except the replica
  suffix varies per word position AND embeds the replica id
  (``word + "xRqP"``), so no shared shingle family forms within a
  replica and cross-replica boundary shingles differ. Timing runs on
  v2, where wall-clock measures the OPERATOR.

Measured bucket integrals (also recomputed by this script when absent):
at ×100 the UNGUARDED candidate-pair integral is 937M (minhash, v1) /
59.5 BILLION (image, v1) — the image verify join alone would shuffle
far beyond a single host; the ``salt_hot_buckets(max_bucket=128)``
guard caps those to 186M / 252M. The image guard bound is
synthesis-INDEPENDENT (252M on v1 and v2 alike): replicated byte-
histogram features genuinely densify feature space, and the guard's
O(c·cap) is exactly what keeps the query runnable.

Minhash ×100 timing is disk-infeasible on this host — MEASURED TWICE,
at cap 128 (123M guarded candidates on v2) and again at cap 32: the
exact-Jaccard verify join ships two ~3-6 KB distinct-shingle-hash
arrays per candidate pair, and both attempts filled >90 GB of shuffle
spill and aborted (partly irreducible at any cap: identical-signature
clusters share a content-hash salt BY DESIGN and cannot be split). On
a 1000-executor cluster the same exchange is ~100 MB per executor —
shuffle volume, not a blow-up. The per-cap evidence for the
max_bucket default is therefore the ×10 CAP-SENSITIVITY rows this
script records (verified-pair output invariant to 0.015% across caps
128/32/16 while wall-clock tracks the candidate exchange) plus the
guarded-vs-unguarded bucket integrals at ×100.

Usage:
  python tools/x100_probe.py [out_json]       # fills missing cells
  python tools/x100_probe.py --mhcap CAP DIR  # internal: one timed run

Timing protocol matches tools/scale_bench.py: fresh JVM per
measurement (warm pass + min of 2 timed runs).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"
DIRS = {
    "v1_x10": "/tmp/spark_graft_scale/x10",
    "v1_x100": "/tmp/spark_graft_scale/x100",
    "v2_x10": "/tmp/spark_graft_scale/x10v2",
    "v2_x100": "/tmp/spark_graft_scale/x100v2",
}
CAP = 128


def synthesize_v2(spark, base_dir: str, out_dir: str, factor: int) -> None:
    """scale_bench.synthesize with a position-varying, replica-tagged
    word suffix — similarity-stationary replication (module docstring)."""
    from pyspark.sql import functions as F

    from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture
    from tools.scale_bench import REPLICA_STRIDE, synthesize

    os.makedirs(out_dir, exist_ok=True)
    docs = load_fixture(spark, base_dir, "documents")
    parts = []
    for r in range(factor):
        d = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(r * REPLICA_STRIDE)
        )
        if r > 0:
            d = d.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t, i: F.concat(
                            t,
                            F.lit(f"x{r}q"),
                            (i % 89).cast("string"),
                        ),
                    ),
                    " ",
                ),
            )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(8).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    # every other table: reuse scale_bench's construction (embeddings
    # rotation / id offsets have no suffix artifact to fix)
    scratch = f"{out_dir}__scratch"
    synthesize(spark, base_dir, scratch, factor)
    for name in os.listdir(scratch):
        if name == "documents.parquet":
            continue
        src, dst = os.path.join(scratch, name), os.path.join(out_dir, name)
        if not os.path.exists(dst):
            os.rename(src, dst)


def _mhcap_run(cap: int, sf_dir: str) -> None:
    """One fresh-JVM cap-sensitivity measurement: prints 'secs pairs'."""
    from etl_platform_nyc_taxi_spark import queries_registry as QR
    from etl_platform_nyc_taxi_spark.operators.dedup import minhash_near_dups
    from etl_platform_nyc_taxi_spark.session import SOAK_CONFS, get_spark

    spark = get_spark(f"x100_mhcap_{cap}", extra_confs=SOAK_CONFS)
    spark.sparkContext.setLogLevel("ERROR")

    def run() -> int:
        return minhash_near_dups(
            QR._docs_with_mutants(spark, sf_dir),
            k=6,
            num_hashes=QR._MH_N,
            bands=QR._MH_BANDS,
            threshold=0.6,
            partitions=spark.sparkContext.defaultParallelism,
            max_bucket=cap,
        ).count()

    run()  # warm
    best, pairs = float("inf"), 0
    for _ in range(2):
        t0 = time.perf_counter()
        pairs = run()
        best = min(best, time.perf_counter() - t0)
    print(f"{round(best, 3)} {pairs}")


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--mhcap":
        _mhcap_run(int(sys.argv[2]), sys.argv[3])
        return 0
    out_json = sys.argv[1] if len(sys.argv) > 1 else "X100_PROBE.json"
    report: dict = {"cap": CAP, "buckets": {}, "queries": {}, "mh_cap": {}}
    if os.path.exists(out_json):
        report.update(json.load(open(out_json)))

    from etl_platform_nyc_taxi_spark.session import SOAK_CONFS, get_spark
    from tools.bucket_probe import PROBES, guarded_pair_work, histogram
    from tools.scale_bench import synthesize

    spark = get_spark("x100_probe", extra_confs=SOAK_CONFS)
    spark.sparkContext.setLogLevel("ERROR")
    for tag, d in DIRS.items():
        if not os.path.exists(d):
            factor = 10 if "x10" in tag and "x100" not in tag else 100
            synth = synthesize_v2 if tag.startswith("v2") else synthesize
            t0 = time.perf_counter()
            synth(spark, BASE, d, factor)
            print(f"synthesized {tag} in {time.perf_counter()-t0:.0f}s",
                  flush=True)

    for name in ("dedup_minhash_lsh", "dedup_image"):
        cells = report["buckets"].setdefault(name, {})
        for tag, d in [("base", BASE)] + list(DIRS.items()):
            if tag in cells:
                continue
            banded = PROBES[name](spark, d).localCheckpoint(eager=True)
            h = histogram(banded)
            h["guarded_pair_work"] = guarded_pair_work(banded, CAP)
            banded.unpersist()
            cells[tag] = h
            print(f"buckets {name}/{tag}: pair_work={h['pair_work']} "
                  f"guarded={h['guarded_pair_work']}", flush=True)
    spark.stop()
    json.dump(report, open(out_json, "w"), indent=1, sort_keys=True)

    me = os.path.abspath(__file__)
    scale_bench = os.path.join(os.path.dirname(me), "scale_bench.py")

    def one(name: str, d: str) -> float:
        p = subprocess.run(
            [sys.executable, scale_bench, "--one", name, d],
            capture_output=True, text=True, check=True,
        )
        return float(p.stdout.strip().splitlines()[-1])

    # image: full ×100 wall-clock on v2 (guard bound 252M pairs × 16-dim
    # features — runnable); minhash: base/×10 on v2, ×100 via the
    # cap-sensitivity path below (cap=128 disk-infeasible, see docstring)
    plans = {
        "dedup_image": [("base", BASE), ("v2_x10", DIRS["v2_x10"]),
                        ("v2_x100", DIRS["v2_x100"])],
        "dedup_minhash_lsh": [("base", BASE), ("v2_x10", DIRS["v2_x10"])],
    }
    for name, cells in plans.items():
        row = report["queries"].setdefault(name, {})
        row["synthesis"] = "v2 (similarity-stationary)"
        for tag, d in cells:
            if f"{tag}_s" in row:
                continue
            row[f"{tag}_s"] = one(name, d)
            print(f"{name} {tag}: {row[f'{tag}_s']}s", flush=True)
            json.dump(report, open(out_json, "w"), indent=1, sort_keys=True)
        if "base_s" in row and "v2_x10_s" in row:
            row["ratio_x10"] = round(row["v2_x10_s"] / row["base_s"], 2)
        if "base_s" in row and "v2_x100_s" in row:
            row["ratio_x100"] = round(row["v2_x100_s"] / row["base_s"], 2)

    # x100 cap attempts are deliberately absent: measured twice (cap 128
    # and cap 32), the verify exchange exceeds this host's disk — the
    # documented result lives in X100_PROBE.json's mh_x100_note.
    for cap, tag, d in [(128, "v2_x10", DIRS["v2_x10"]),
                        (32, "v2_x10", DIRS["v2_x10"]),
                        (16, "v2_x10", DIRS["v2_x10"])]:
        key = f"{tag}_cap{cap}"
        if key in report["mh_cap"]:
            continue
        p = subprocess.run(
            [sys.executable, me, "--mhcap", str(cap), d],
            capture_output=True, text=True, check=True,
        )
        secs, pairs = p.stdout.strip().splitlines()[-1].split()
        report["mh_cap"][key] = {"s": float(secs), "verified_pairs": int(pairs)}
        print(f"mh_cap {key}: {secs}s {pairs} pairs", flush=True)
        json.dump(report, open(out_json, "w"), indent=1, sort_keys=True)

    print(json.dumps({"queries": report["queries"],
                      "mh_cap": report["mh_cap"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
