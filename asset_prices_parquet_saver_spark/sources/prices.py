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
    within each file so per-symbol range scans are contiguous.

    NOTE on ``mode='overwrite'`` under :func:`session.get_spark`: the
    session pins ``partitionOverwriteMode=dynamic``, so overwrite
    replaces ONLY the source partitions present in ``df`` — a rebuild
    from a frame that lacks some source leaves that source's old
    partition in place. For a true full replace, write with
    ``.option("partitionOverwriteMode", "static")`` or clear the path
    first."""
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


def write_prices_bucketed(
    df: DataFrame, table: str, num_buckets: int = 32
) -> None:
    """Warehouse-managed variant bucketed+sorted by symbol: two bucketed
    tables with matching bucketing join/aggregate on symbol without a
    shuffle — the co-location the reference got implicitly from
    one-file-per-symbol, kept at cluster scale."""
    (
        df.select([f.name for f in BAR_SCHEMA.fields])
        .write.bucketBy(num_buckets, "symbol")
        .sortBy("symbol", "timestamp")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def compact_prices(
    spark: SparkSession, path: str, max_records_per_file: int = 5_000_000
) -> None:
    """Rewrite the dataset with size-targeted files per source
    partition. The reference's layout degrades into one tiny file per
    symbol (small-files problem); a live `foreachBatch` sink degrades
    the same way over time — periodic compaction is the standing fix.
    The swap is two renames (POSIX cannot exchange directories in one
    step), so a crash between them can leave the data ONLY under the
    ``.old`` backup; :func:`recover_compaction` — called here before
    every run — renames it back, and a stale backup from a crash AFTER
    the second rename is deleted rather than wedging the next
    compaction with ENOTEMPTY. Single-writer protocol, like the live
    sink: do not run compaction concurrently with another writer
    (writes landing between the staging write and the swap would be
    discarded); on the manifest layout use
    ``manifest.compact_versioned``, which has a real atomic publish
    and an expect_version guard instead."""
    import os
    import shutil

    recover_compaction(path)
    df = read_prices(spark, path)
    staging = path.rstrip("/") + ".compact"
    (
        df.repartition("source")
        .sortWithinPartitions("symbol", "timestamp")
        .write.option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("source")
        .mode("overwrite")
        .parquet(staging)
    )
    backup = path.rstrip("/") + ".old"
    os.replace(path, backup)
    os.replace(staging, path)
    shutil.rmtree(backup, ignore_errors=True)


def recover_compaction(path: str) -> bool:
    """Heal a crashed :func:`compact_prices` swap. Crash windows:

    - after ``path -> .old`` but before ``.compact -> path``: the only
      copy lives in ``.old`` — rename it back (the half-written
      staging directory is discarded);
    - after the second rename but before the backup delete: ``path``
      is live and ``.old`` is a stale duplicate — delete it (leaving
      it would fail the next compaction's ``os.replace`` with
      ENOTEMPTY).

    Returns True if a restore (the first case) happened."""
    import os
    import shutil

    backup = path.rstrip("/") + ".old"
    staging = path.rstrip("/") + ".compact"
    if not os.path.exists(backup):
        return False
    if os.path.exists(path):
        shutil.rmtree(backup, ignore_errors=True)  # stale duplicate
        return False
    shutil.rmtree(staging, ignore_errors=True)  # half-written staging
    os.replace(backup, path)
    return True
