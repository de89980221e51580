"""CLI entry point (G8): `python -m etl_platform_nyc_taxi_spark` runs the
two flagship pipelines end-to-end — reference argv contract
(dags/spark_jobs/calculate_daily_transactions.py:114-130) minus the
BaseHook coupling. Parquet sink and embedded-Derby JDBC sink both land."""

from __future__ import annotations

import datetime as dt

import pytest

from etl_platform_nyc_taxi_spark.__main__ import main, parse_args


@pytest.fixture
def trip_data(spark, tmp_path):
    """Synthetic trip data honoring the reference schema contract
    (pickup_datetime + PULocationID, README.md:57,101)."""
    rows = [
        (dt.datetime(2024, 6, 1, 8, 0), 132),
        (dt.datetime(2024, 6, 1, 9, 0), 132),
        (dt.datetime(2024, 6, 1, 10, 0), 7),
        (dt.datetime(2024, 6, 2, 8, 0), 7),
        (None, 99),  # null pickup: excluded, as in the corrected plan
    ]
    src = str(tmp_path / "tripdata")
    spark.createDataFrame(
        rows, "pickup_datetime timestamp, PULocationID long"
    ).write.mode("overwrite").parquet(src)
    return src


def _argv(job, ds, src, sink, table, *extra):
    return [job, ds, src, sink, table, "--poke-interval", "0.1",
            "--sensor-timeout", "5", "--retries", "0", *extra]


def test_cli_daily_transactions_parquet_sink(spark, trip_data, tmp_path):
    out = str(tmp_path / "out")
    rc = main(
        _argv("daily_transactions", "2024-06-01", trip_data, out, "daily_transaction"),
        spark=spark,
    )
    assert rc == 0
    got = spark.read.parquet(f"{out}/daily_transaction").collect()
    assert len(got) == 1
    assert got[0]["transaction_date"] == dt.date(2024, 6, 1)
    assert got[0]["total_transactions"] == 3
    assert got[0]["calculated_at"] is not None


def test_cli_daily_transactions_zero_fill(spark, trip_data, tmp_path):
    """C3: a day with no rows still lands a (day, 0) row."""
    out = str(tmp_path / "out")
    main(
        _argv("daily_transactions", "2024-07-15", trip_data, out, "daily_transaction"),
        spark=spark,
    )
    got = spark.read.parquet(f"{out}/daily_transaction").collect()
    assert len(got) == 1 and got[0]["total_transactions"] == 0


def test_cli_top_zones_parquet_sink(spark, trip_data, tmp_path):
    out = str(tmp_path / "out")
    rc = main(
        _argv("top_zones", "2024-06-02", trip_data, out, "daily_topfive_taxi_zone"),
        spark=spark,
    )
    assert rc == 0
    got = {
        r["taxi_zone_id"]: r["rank"]
        for r in spark.read.parquet(f"{out}/daily_topfive_taxi_zone").collect()
    }
    # zone 7: 2 trips ≤ cutoff; zone 132: 2 trips — dense_rank ties at 1
    assert got == {7: 1, 132: 1}


def test_cli_jdbc_sink_upsert_idempotent(spark, trip_data, tmp_path):
    """Full CLI → embedded Derby path: create table, upsert, re-run (the
    Airflow-retry scenario) — converges instead of violating the PK."""
    url = f"jdbc:derby:{tmp_path}/clidb;create=true"
    argv = _argv(
        "daily_transactions", "2024-06-01", trip_data, url, "daily_transaction"
    )
    assert main(argv, spark=spark) == 0
    assert main(argv, spark=spark) == 0  # replay converges (D2 fix)

    from etl_platform_nyc_taxi_spark.__main__ import _infer_driver
    from etl_platform_nyc_taxi_spark.sources.jdbc import JdbcConfig, read_jdbc

    cfg = JdbcConfig(url=url, driver=_infer_driver(url))
    got = read_jdbc(spark, cfg, "daily_transaction").collect()
    assert len(got) == 1 and got[0]["total_transactions"] == 3


def test_cli_sensor_times_out_on_missing_input(spark, tmp_path):
    from etl_platform_nyc_taxi_spark.plans.runner import SensorTimeout

    with pytest.raises(SensorTimeout):
        main(
            _argv(
                "daily_transactions",
                "2024-06-01",
                str(tmp_path / "nowhere"),
                str(tmp_path / "out"),
                "t",
            )[:-4] + ["--poke-interval", "0.05", "--sensor-timeout", "0.2",
                      "--retries", "0"],
            spark=spark,
        )


def test_parse_args_defaults_match_reference():
    a = parse_args(["daily_transactions", "2024-06-01", "/d", "jdbc:postgresql://x/db", "t"])
    assert a.ts_col == "pickup_datetime" and a.zone_col == "PULocationID"
    assert a.retries == 1 and a.retry_delay == 300.0  # dag:30-31
    assert a.poke_interval == 300.0 and a.sensor_timeout == 1800.0  # dag:61-62
