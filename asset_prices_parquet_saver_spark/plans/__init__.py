"""Query plans: the registry consumed by __spark_entry__ and bench.py."""

from asset_prices_parquet_saver_spark.plans.queries import ORACLE, QUERIES

__all__ = ["ORACLE", "QUERIES"]
