"""Sources & sinks: parquet scans/probes, local rows, fixture loader, JDBC."""

from etl_platform_nyc_taxi_spark.sources.parquet import (
    list_parquet_files,
    read_parquet,
    read_parquet_dir,
    probe_schema,
    load_fixture,
    load_fixtures,
)
from etl_platform_nyc_taxi_spark.sources.rows import rows_source
from etl_platform_nyc_taxi_spark.sources.jdbc import (
    JdbcConfig,
    read_jdbc,
    write_jdbc_append,
    write_jdbc_overwrite,
    write_jdbc_upsert,
)

__all__ = [
    "list_parquet_files",
    "read_parquet",
    "read_parquet_dir",
    "probe_schema",
    "load_fixture",
    "load_fixtures",
    "rows_source",
    "JdbcConfig",
    "read_jdbc",
    "write_jdbc_append",
    "write_jdbc_overwrite",
    "write_jdbc_upsert",
]
