"""The live-price streaming pipeline (T1-T7, SURVEY §2.9, §3.2).

The reference hand-rolls a micro-batch loop: poll Alpaca every 60 s
(update_live_price.py:118, :192), validate ticks (:160-168), and
read-modify-write one Parquet file per symbol (:200-297), with a
feedback blacklist for symbols the API rejects (:170-181).

Structured Streaming expresses the same pipeline declaratively:

    ticks readStream
      → P7 validity filter
      → watermark + dropDuplicates (T7 late/dup handling)
      → foreachBatch: J4 keep-latest merge into the prices dataset
                      + T4 blacklist side-output to symbol_status

The 60 s poll cycle *is* ``trigger(processingTime='60 seconds')``; state
is the prices table itself, so the sink is exactly-once per epoch via
the overwrite commit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.operators.merge import upsert_live_prices
from asset_prices_parquet_saver_spark.schema import BAR_SCHEMA
from asset_prices_parquet_saver_spark.sources.prices import write_prices


def dedupe_ticks_with_watermark(
    ticks: DataFrame, lateness: str = "1 day"
) -> DataFrame:
    """T7: P7 validity filter + event-time dedupe.

    The reference accepts unbounded lateness (any tick for an existing
    date overwrites, update_live_price.py:250-258); a 1-day watermark
    bounds streaming state while matching the implicit 1-day tumbling
    window of the date-keyed upsert."""
    return (
        ticks.filter(F.col("price").isNotNull() & F.col("ts").isNotNull())
        .withWatermark("ts", lateness)
        .dropDuplicates(["symbol", "ts"])
    )


def run_live_upsert(
    spark: SparkSession,
    ticks_stream: DataFrame,
    prices_path: str,
    source: str = "alpaca",
    trigger_seconds: int | None = 60,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
    on_batch: Callable[[DataFrame, int], None] | None = None,
    layout: str = "daily",
):
    """Start the live upsert query (T1/T3): every micro-batch merges its
    ticks into the prices dataset with the reference's last-write-wins-
    per-(symbol, day) semantics (J4).

    ``layout='daily'`` (default, the scale path): the sink is the
    partition-pruned incremental merge into a (source, day)-partitioned
    dataset — per-batch cost O(ticks + touched-day partitions),
    committed by Spark's dynamic partition overwrite, no driver
    filesystem calls (works against HDFS/S3 warehouses).

    ``layout='flat'`` (local-mode convenience): whole-dataset rewrite
    into a flat directory via a staging write + two driver-local
    ``os.replace`` renames. Only meaningful where the driver's local
    filesystem IS the warehouse; a crash between the renames is
    recovered at the next batch (the ``.old`` backup is restored).
    """
    if layout not in ("daily", "flat"):
        raise ValueError(f"unknown layout {layout!r}: expected 'daily' or 'flat'")

    def merge_batch_daily(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        from asset_prices_parquet_saver_spark.sources.prices_daily import (
            merge_ticks_incremental,
        )

        merge_ticks_incremental(spark, prices_path, batch, source=source)
        if on_batch is not None:
            on_batch(batch, epoch_id)

    def merge_batch_flat(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        import os
        import shutil

        staging = prices_path.rstrip("/") + ".staging"
        backup = prices_path.rstrip("/") + ".old"
        # crash recovery: a previous batch that died between its two
        # renames left the dataset missing with the backup intact —
        # restore it BEFORE reading, or the merge would silently treat
        # the table as empty and drop all history.
        if not os.path.exists(prices_path) and os.path.exists(backup):
            os.replace(backup, prices_path)
        try:
            prices = spark.read.schema(BAR_SCHEMA).parquet(prices_path)
            prices.head(1)
        except Exception:
            prices = spark.createDataFrame([], BAR_SCHEMA)
        merged = upsert_live_prices(prices, batch, source=source)
        # Overwriting the dataset being lazily read would corrupt the
        # read; write the merge to a staging dir and swap — the same
        # tmp+rename idea as the reference's atomic writes
        # (update_live_price.py:288-293), at dataset granularity. All
        # work stays distributed; no driver-side materialization.
        write_prices(merged, staging, mode="overwrite")
        # a stale backup (crash after a completed swap) would make the
        # rename below fail with ENOTEMPTY — clear it first
        shutil.rmtree(backup, ignore_errors=True)
        if os.path.exists(prices_path):
            os.replace(prices_path, backup)
        os.replace(staging, prices_path)
        shutil.rmtree(backup, ignore_errors=True)
        if on_batch is not None:
            on_batch(batch, epoch_id)

    merge_batch = merge_batch_daily if layout == "daily" else merge_batch_flat
    deduped = dedupe_ticks_with_watermark(ticks_stream)
    writer = deduped.writeStream.outputMode("update").foreachBatch(merge_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
