"""Reference-parity pipelines + scheduler-agnostic runner."""

from etl_platform_nyc_taxi_spark.plans.daily_transactions import daily_transactions
from etl_platform_nyc_taxi_spark.plans.top_zones import top_k_zones
from etl_platform_nyc_taxi_spark.plans.runner import Pipeline, Step

__all__ = ["daily_transactions", "top_k_zones", "Pipeline", "Step"]
