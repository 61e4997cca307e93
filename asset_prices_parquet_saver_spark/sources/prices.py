"""The partitioned ``prices`` dataset (SURVEY §1.5, §7.1).

Replaces the reference's one-Parquet-file-per-(symbol,source) layout
(download_historical_price.py:74-82, :429, :455) with a single dataset
partitioned by ``source`` — symbol is a data column. This kills the
small-files problem at 100 TB, gives partition pruning on source, and
lets one write commit atomically (the reference hand-rolls atomicity via
tmp-file + os.replace at download_historical_price.py:429-432; Spark's
output-commit protocol plus dynamic partition overwrite provides the
same guarantee per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from asset_prices_parquet_saver_spark.schema import BAR_SCHEMA


def write_prices(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write bars partitioned by source, sorted by (symbol, timestamp)
    within each file so per-symbol range scans are contiguous."""
    (
        df.select([f.name for f in BAR_SCHEMA.fields])
        .repartition("source")
        .sortWithinPartitions("symbol", "timestamp")
        .write.partitionBy("source")
        .mode(mode)
        .parquet(path)
    )


def read_prices(spark: SparkSession, path: str) -> DataFrame:
    """Scan the prices dataset (source partition column recovered)."""
    return spark.read.schema(BAR_SCHEMA).parquet(path)
