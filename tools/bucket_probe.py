"""Bucket-occupancy diagnostic for the LSH pair-generation family
(VERDICT r3 task 3): per-(band,key) / (table,bucket) occupancy at the base
scale and a FACTOR× synthesized scale, plus sum(c*(c-1)/2) — the exact
number of raw candidate pairs the self-join generates — so superlinear
scale ratios can be attributed to candidate growth vs verify cost.

Usage: python tools/bucket_probe.py [factor] [base_sf_dir]
Prints one JSON line per (query, scale) with top-10 bucket counts and the
pair-work integral.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")


def minhash_banded(spark, sf_dir):
    from etl_platform_nyc_taxi_spark import queries_registry as QR
    from etl_platform_nyc_taxi_spark.functions.hashing import (
        MINHASH_P,
        minhash_coeffs,
    )
    from etl_platform_nyc_taxi_spark.operators.dedup import hashed_shingles
    from pyspark.sql import functions as F

    df = QR._docs_with_mutants(spark, sf_dir)
    num_hashes, bands = QR._MH_N, QR._MH_BANDS
    rows_per_band = num_hashes // bands
    coeffs = minhash_coeffs(num_hashes)
    hashed = hashed_shingles(df, "doc_id", "text", 6,
                             spark.sparkContext.defaultParallelism)
    h = F.col("__h")
    sig = hashed.groupBy("__id").agg(
        *[
            F.min(((h * F.lit(a)) % F.lit(MINHASH_P) + F.lit(c)) % F.lit(MINHASH_P)).alias(f"__m{i}")
            for i, (a, c) in enumerate(coeffs)
        ]
    )
    return sig.select(
        "__id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws("|", *[F.col(f"__m{b * rows_per_band + i}") for i in range(rows_per_band)]).alias("key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select(F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def image_banded(spark, sf_dir):
    from etl_platform_nyc_taxi_spark.functions.vectors import mean_center
    from etl_platform_nyc_taxi_spark.operators.multimodal import image_features
    from etl_platform_nyc_taxi_spark.operators.similarity import table_signatures_udf
    from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture
    from pyspark.sql import functions as F

    d = load_fixture(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    corpus = d.unionByName(
        d.select((F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "payload")
    )
    feats = image_features(corpus, dim=16).select(
        F.col("doc_id").alias("vec_id"), mean_center(F.col("feat")).alias("embedding")
    )
    sigs = table_signatures_udf(8, 4, 16, 42)
    return feats.select(
        F.posexplode(sigs(F.col("embedding"))).alias("band", "key")
    ).select("band", "key")


def embedding_banded(spark, sf_dir):
    from etl_platform_nyc_taxi_spark.operators.similarity import table_signatures_udf
    from etl_platform_nyc_taxi_spark.sources.parquet import load_fixture
    from pyspark.sql import functions as F

    emb = load_fixture(spark, sf_dir, "embeddings")
    sigs = table_signatures_udf(8, 6, 64, 42)
    return emb.select(
        F.posexplode(sigs(F.col("embedding"))).alias("band", "key")
    ).select("band", "key")


PROBES = {
    "dedup_minhash_lsh": minhash_banded,
    "dedup_image": image_banded,
    "dedup_embedding_lsh": embedding_banded,
}


def histogram(banded):
    from pyspark.sql import functions as F

    counts = banded.groupBy("band", "key").agg(F.count(F.lit(1)).alias("c"))
    top = [
        {"band": r["band"], "key": str(r["key"])[:24], "c": r["c"]}
        for r in counts.orderBy(F.desc("c")).limit(10).collect()
    ]
    agg = counts.agg(
        F.count(F.lit(1)).alias("buckets"),
        F.sum("c").alias("rows"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pair_work"),
        F.max("c").alias("max_c"),
    ).collect()[0]
    return {
        "buckets": agg["buckets"],
        "rows": agg["rows"],
        "pair_work": int(agg["pair_work"]),
        "max_bucket": agg["max_c"],
        "top10": top,
    }


def guarded_pair_work(banded, cap: int = 128) -> int:
    """The candidate-pair bound the salt_hot_buckets guard enforces on
    this banded relation (VERDICT r11 task 5): per bucket of size c,
    the guard splits into nsalts = ceil(c/cap) content-hash sub-buckets,
    so pair work is at most nsalts × C(ceil(c/nsalts), 2) — O(c·cap)
    instead of O(c²). The realized split depends on the content-hash
    spread; this is the worst-even-split upper bound."""
    from pyspark.sql import functions as F

    counts = banded.groupBy("band", "key").agg(F.count(F.lit(1)).alias("c"))
    ns = F.ceil(F.col("c") / F.lit(cap))
    sub = F.ceil(F.col("c") / ns)
    agg = counts.agg(
        F.sum(ns * sub * (sub - 1) / 2).alias("gpw")
    ).collect()[0]
    return int(agg["gpw"])


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    scaled_dir = f"/tmp/spark_graft_scale/x{factor}"

    from etl_platform_nyc_taxi_spark.session import get_spark

    spark = get_spark("bucket_probe")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(scaled_dir):
        from tools.scale_bench import synthesize

        synthesize(spark, base, scaled_dir, factor)

    out = {}
    for name, probe in PROBES.items():
        out[name] = {
            "base": histogram(probe(spark, base)),
            "scaled": histogram(probe(spark, scaled_dir)),
        }
        print(json.dumps({name: out[name]}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
