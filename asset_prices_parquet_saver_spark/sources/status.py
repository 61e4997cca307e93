"""Symbol-status table (SURVEY §1.4 → §1.5).

Replaces the reference's newline-delimited blacklist files
(``*_invalid_symbols.txt`` loaded at download_historical_price.py:114-126
and appended at :128-144; ``alpaca_symbols_without_data.txt`` rewritten
whole at :393-402) with a small Parquet table
``symbol_status(symbol, source, status, updated_at)``. Exclusion is a
broadcast left-anti join (operators.symbols.exclude_status) instead of a
driver-side ``in set`` check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.schema import SYMBOL_STATUS_SCHEMA


def read_status(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.schema(SYMBOL_STATUS_SCHEMA).parquet(path)
    except Exception:  # first run: empty table
        return spark.createDataFrame([], SYMBOL_STATUS_SCHEMA)


def append_status(
    spark: SparkSession, path: str, rows: DataFrame
) -> DataFrame:
    """Union new status rows in, dedupe to latest per (symbol, source,
    status) — the relational form of the reference's append-then-reload
    set semantics (U3)."""
    merged = (
        read_status(spark, path)
        .unionByName(rows.select([f.name for f in SYMBOL_STATUS_SCHEMA.fields]))
        .groupBy("symbol", "source", "status")
        .agg(F.max("updated_at").alias("updated_at"))
        .select("symbol", "source", "status", "updated_at")
    )
    return merged
