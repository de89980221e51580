"""Multi-format connectors (sources/formats.py): round-trips, explicit
schemas, malformed-row quarantine, and interchange→parquet ingest."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tests.conftest import rows


def _sample(spark):
    from etl_platform_nyc_taxi_spark.sources.rows import rows_source

    return rows_source(
        spark,
        [
            (1, "alpha", 1.5, dt.datetime(2024, 1, 1, 10)),
            (2, "beta", -2.0, dt.datetime(2024, 1, 2, 11)),
            (3, "gamma, with comma", 0.0, None),
        ],
        "id long, name string, score double, ts timestamp",
    )


def test_csv_round_trip(spark, tmp_path):
    from etl_platform_nyc_taxi_spark.sources.formats import read_csv, write_csv

    df = _sample(spark)
    path = str(tmp_path / "csv")
    write_csv(df, path)
    back = read_csv(
        spark, path, schema="id long, name string, score double, ts timestamp"
    )
    assert rows(back) == rows(df)


def test_json_round_trip(spark, tmp_path):
    from etl_platform_nyc_taxi_spark.sources.formats import read_json, write_json

    df = _sample(spark)
    path = str(tmp_path / "json")
    write_json(df, path)
    back = read_json(
        spark, path, schema="id long, name string, score double, ts timestamp"
    )
    assert rows(back) == rows(df)


def test_orc_round_trip(spark, tmp_path):
    from etl_platform_nyc_taxi_spark.sources.formats import read_orc, write_orc

    df = _sample(spark)
    path = str(tmp_path / "orc")
    write_orc(df, path)
    assert rows(read_orc(spark, path)) == rows(df)


def test_csv_quarantine_split(spark, tmp_path):
    from etl_platform_nyc_taxi_spark.sources.formats import (
        quarantine_split,
        read_csv,
    )

    p = tmp_path / "bad.csv"
    p.write_text("id,score\n1,1.5\nnot_an_int,xyz\n2,2.5\n")
    df = read_csv(
        spark,
        str(p),
        schema="id long, score double, _corrupt_record string",
        mode="PERMISSIVE",
    )
    clean, bad = quarantine_split(df)
    assert sorted(r.id for r in clean.collect()) == [1, 2]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "not_an_int" in bad_rows[0]._corrupt_record
    assert "_corrupt_record" not in clean.columns


def test_json_permissive_quarantine(spark, tmp_path):
    from etl_platform_nyc_taxi_spark.sources.formats import (
        quarantine_split,
        read_json,
    )

    p = tmp_path / "bad.json"
    p.write_text('{"id": 1, "v": "ok"}\n{broken json\n{"id": 2, "v": "fine"}\n')
    df = read_json(
        spark, str(p), schema="id long, v string, _corrupt_record string"
    )
    # materialize: Spark refuses corrupt-column-only queries on raw scans
    clean, bad = quarantine_split(df, materialize=True)
    assert sorted(r.id for r in clean.collect()) == [1, 2]
    assert bad.count() == 1


def test_ingest_to_parquet_partitioned_prunes(spark, tmp_path):
    """CSV → partitioned parquet; a partition-key filter on the result must
    hit PartitionFilters (pruning), not scan all partitions."""
    from etl_platform_nyc_taxi_spark.sources.formats import (
        ingest_to_parquet,
        read_csv,
        write_csv,
    )

    df = _sample(spark).withColumn("d", F.to_date("ts"))
    csv_path = str(tmp_path / "raw_csv")
    write_csv(df, csv_path)
    back = read_csv(
        spark, csv_path, schema="id long, name string, score double, ts timestamp, d date"
    )
    dest = str(tmp_path / "ingested")
    ingest_to_parquet(back, dest, partition_by=["d"])

    q = spark.read.parquet(dest).filter(F.col("d") == dt.date(2024, 1, 1))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "isnotnull(d" in plan, plan
    assert [r.id for r in q.collect()] == [1]
