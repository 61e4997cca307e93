"""Inspection utilities (S9, O1-O4; SURVEY §2.1, §2.6, §3.3).

``parquet_details.py`` lists the most-recently-modified Parquet files
(:15-23, sort by st_mtime desc, top-N) and prints head/tail/schema
(:25-38). Spark-native: the hidden ``_metadata`` column provides file
mtime without a driver-side listing; head/tail are sorted limits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def latest_files(spark: SparkSession, path: str, n: int = 5) -> DataFrame:
    """O3/S9: top-N parquet files under ``path`` by modification time.

    Routed through the manifest-aware reader: on a manifest table a
    bare recursive scan would list files from the GC-retained previous
    snapshot and from crashed writers' orphan segments — files that
    are not part of the live table (an in-flight half-written segment
    could even top the mtime list)."""
    from asset_prices_parquet_saver_spark.sources.tables import read_dataset

    return (
        read_dataset(spark, path)
        .select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.file_modification_time").alias("mtime"),
        )
        .distinct()
        .orderBy(F.col("mtime").desc(), F.col("file_path"))
        .limit(n)
    )


def head_tail(df: DataFrame, order_by: list, n: int = 5) -> DataFrame:
    """O4: first-N and last-N rows by a total ordering, tagged with a
    ``part`` column ('head'/'tail') — what show_head_tail_and_schema
    prints (parquet_details.py:33-34)."""
    asc = df.orderBy(*[c.asc() for c in order_by]).limit(n).withColumn(
        "part", F.lit("head")
    )
    desc = df.orderBy(*[c.desc() for c in order_by]).limit(n).withColumn(
        "part", F.lit("tail")
    )
    return asc.unionByName(desc)
