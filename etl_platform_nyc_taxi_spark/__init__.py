"""etl_platform_nyc_taxi_spark — a PySpark-native analytics engine.

Brand-new engine with the query and data-processing capabilities of the
reference ETL platform (GuySuphakit/ETL_Platform_NYC_Taxi): parameterized
daily-aggregate and top-k-ranking analytics over schema-drifting Parquet,
JDBC (PostgreSQL) sinks, and a scheduler-agnostic pipeline runner — rebuilt
as a composable operator library on the DataFrame/Catalyst stack, plus
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Layout:
    session    SparkSession factory (UTC tz, AQE, sane shuffle partitions)
    schema     canonical trip schema + fixture schemas + drift resolution
    sources    parquet scan/glob/probe, local rows, JDBC read, sinks
    operators  core relational ops, window top-k, joins, dedup, similarity,
               text analysis, multimodal plumbing
    functions  reusable column expressions (dates, portable hashing, vectors)
    plans      reference-parity pipelines + scheduler-agnostic runner
    streaming  Structured Streaming variants of the batch pipelines
"""

__version__ = "0.1.0"
