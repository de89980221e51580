"""Top-k zones pipeline — the reference's job 2 with its D1 defect fixed.

Reference semantics (dags/spark_jobs/calculate_top_taxi_zones.py:29-87):
PER monthly file: filter ``to_date(pickup) <= cutoff`` → count by zone →
GLOBAL dense_rank desc → keep rank ≤ 5; then union the per-file results
with no re-aggregation (defect D1: per-file top-5s concatenated, duplicate
zones, colliding ranks — contradicting its own README's "top 5 over all
historical data").

The engine's primary is the corrected GLOBAL semantics: one scan over all
files → one count per zone → dense_rank → rank ≤ k. Tie semantics are the
reference's exactly: dense_rank can keep >k zones, never skips ranks.
:func:`top_k_zones_perfile` reproduces the buggy shape for documentation/
compat tests only.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.functions.dates import ts_on_or_before
from etl_platform_nyc_taxi_spark.operators.core import union_all
from etl_platform_nyc_taxi_spark.operators.windows import top_k_by_count


def top_k_zones(
    df: DataFrame,
    cutoff: dt.date | str,
    zone_col: str = "PULocationID",
    ts_col: str = "pickup_datetime",
    k: int = 5,
    audit: bool = True,
) -> DataFrame:
    """Corrected global top-k: rank zones by all-history trip count.

    The window ranks the per-zone aggregate (≤ |zones| rows), never the
    fact rows — the 100 TB-safe shape (SURVEY.md §7.5). Output matches the
    reference's ``daily_topfive_taxi_zone`` contract:
    (taxi_zone_id, rank, calculated_at).
    """
    cutoff = dt.date.fromisoformat(cutoff) if isinstance(cutoff, str) else cutoff
    top = top_k_by_count(
        df.filter(ts_on_or_before(ts_col, cutoff, df=df)),
        key=zone_col,
        k=k,
        count_name="trip_count",
        rank_name="rank",
        method="dense_rank",
    )
    cols = [F.col(zone_col).alias("taxi_zone_id"), F.col("rank")]
    if audit:
        cols.append(F.current_timestamp().alias("calculated_at"))
    return top.select(*cols).orderBy("rank")


def top_k_zones_perfile(
    dfs: Sequence[DataFrame],
    cutoff: dt.date | str,
    zone_col: str = "PULocationID",
    ts_col: str = "pickup_datetime",
    k: int = 5,
) -> DataFrame:
    """Reference-compatible per-file variant (defect D1 preserved, for
    pinning the deviation in tests): rank WITHIN each input, then bag-union
    the ranked slices. Returns up to k·len(dfs) rows with colliding ranks."""
    ranked_slices = [
        top_k_by_count(
            df.filter(ts_on_or_before(ts_col, cutoff, df=df)),
            key=zone_col,
            k=k,
            count_name="trip_count",
            rank_name="rank",
        ).select(F.col(zone_col).alias("taxi_zone_id"), "rank")
        for df in dfs
    ]
    return union_all(*ranked_slices)
