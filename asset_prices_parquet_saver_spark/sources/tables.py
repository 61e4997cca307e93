"""Parquet scan helpers for the driver's star schema (S6, SURVEY §2.1).

The reference reads one pandas frame per file (update_live_price.py:227,
compare_parquet.py:32, parquet_details.py:32); here a scan is a lazy
``spark.read.parquet`` so Catalyst pushes filters and prunes columns into
the vectorized Parquet reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.schema import TESTDATA_TABLES

#: Columns written as parquet TIMESTAMP(NANOS), which Spark's vectorized
#: reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read them as
#: raw int64 nanos (legacy conf) and truncate to microsecond timestamps
#: — exactly what DuckDB's ns→µs coercion yields, keeping the oracle
#: comparison exact.
_NANO_TS_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table of the test star schema."""
    # The driver may hand us a vanilla session; timestamp↔date semantics
    # must match DuckDB's naive-UTC reading for the oracle comparison.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    nano_cols = _NANO_TS_COLUMNS.get(name, [])
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in nano_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Scan several tables; all of TESTDATA_TABLES when none named."""
    names = names or tuple(TESTDATA_TABLES)
    return {n: read_table(spark, sf_dir, n) for n in names}
