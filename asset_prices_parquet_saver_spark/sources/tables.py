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

#: Event-time columns that must surface as session-tz TIMESTAMP no matter
#: how the generator wrote them. Seen so far across driver testdata
#: generations: parquet TIMESTAMP(NANOS) (Spark's vectorized reader
#: rejects it → read as raw int64 nanos via the legacy conf and truncate
#: to µs, matching DuckDB's ns→µs coercion) and plain timestamp[us]
#: without UTC metadata (Spark 4 infers TIMESTAMP_NTZ → cast to
#: TIMESTAMP, a wall-clock identity under the pinned UTC session tz).
#: The adaptation is schema-driven, not config-driven, so a future
#: regeneration can't break every events query again.
_EVENT_TIME_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table of the test star schema."""
    # The driver may hand us a vanilla session; timestamp↔date semantics
    # must match DuckDB's naive-UTC reading for the oracle comparison.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ts_cols = _EVENT_TIME_COLUMNS.get(name, [])
    if ts_cols:
        # Session-global BY DESIGN, and deliberately never unset: the
        # conf must still hold when the LAZY plan executes (possibly
        # long after this call), so restore-after-read is wrong. The
        # side effect on foreign reads is benign here because this
        # engine's own readers adapt either representation (the bigint
        # branch below); a library embedding this module into a session
        # with its own TIMESTAMP(NANOS) reads would need to scope it.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in ts_cols:
        dtype = df.schema[c].dataType.simpleString()
        if dtype == "bigint":  # TIMESTAMP(NANOS) read as raw int64
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtype != "timestamp":  # timestamp_ntz (or string, defensively)
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Scan several tables; all of TESTDATA_TABLES when none named."""
    names = names or tuple(TESTDATA_TABLES)
    return {n: read_table(spark, sf_dir, n) for n in names}


def read_dataset(spark: SparkSession, path: str) -> DataFrame:
    """Open a dataset path however it is stored: a manifest table
    (resolved through its committed snapshot — never scans orphan or
    in-flight segments) or a plain parquet directory/file. The CLI
    commands route through this so every tool works on both layouts."""
    from asset_prices_parquet_saver_spark.sources import manifest

    if os.path.exists(os.path.join(path, manifest.MANIFEST)):
        return manifest.read_versioned(spark, path)
    return spark.read.parquet(path)
