"""Reusable column-expression helpers (all JVM-side, codegen-friendly)."""

from etl_platform_nyc_taxi_spark.functions.dates import (
    derive_date,
    ts_on_date,
    ts_on_or_before,
)
from etl_platform_nyc_taxi_spark.functions.hashing import (
    portable_hash64,
    fast_hash64,
    minhash_sig,
    shingles,
    simhash64,
    hamming64,
)
from etl_platform_nyc_taxi_spark.functions.vectors import (
    dot,
    l2_norm,
    cosine_similarity,
)

__all__ = [
    "derive_date",
    "ts_on_date",
    "ts_on_or_before",
    "portable_hash64",
    "fast_hash64",
    "minhash_sig",
    "shingles",
    "simhash64",
    "hamming64",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
