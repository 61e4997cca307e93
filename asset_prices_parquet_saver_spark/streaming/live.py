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


def dedupe_retransmissions(
    ticks: DataFrame, key_cols: list[str], lateness: str = "10 minutes"
) -> DataFrame:
    """T7 retransmission dedupe: drop records whose business key repeats
    within the watermark delay even when the event timestamps DIFFER
    (feed failover replays the same trade with a new receive ts, so an
    exact-``ts`` dropDuplicates misses it). dropDuplicatesWithinWatermark
    keeps first-seen per key and — unlike a keyed dropDuplicates without
    event-time, whose state grows forever — evicts each key's state once
    the watermark passes it, so state is bounded by (key arrival rate ×
    delay) regardless of stream lifetime."""
    return (
        ticks.filter(F.col("ts").isNotNull())
        .withWatermark("ts", lateness)
        .dropDuplicatesWithinWatermark(key_cols)
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

    ``layout='flat'``: whole-dataset rewrite committed through the
    manifest protocol (sources/manifest.py) — each batch writes an
    immutable snapshot directory and atomically publishes a one-file
    pointer to it. No directory renames, no window where the table is
    missing, crash-of-writer leaves only an orphan snapshot that the
    next commit numbers past and garbage-collects; the only atomic
    primitive is single-object publish, which object stores have.
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
        from asset_prices_parquet_saver_spark.sources import manifest

        # Derived rewrite, so it follows manifest.py's lost-update
        # contract: pin expect_version to the snapshot the merge plan
        # read (an out-of-band committer — compaction, a second stream
        # — would otherwise be silently folded away) and retry against
        # the fresh state on conflict. txn makes a replayed epoch after
        # crash-restart a no-op instead of an extra rewrite.
        for attempt in range(3):
            v = manifest.current_version(prices_path)
            prices = manifest.read_versioned(
                spark, prices_path, schema=BAR_SCHEMA, version=v
            )
            merged = upsert_live_prices(prices, batch, source=source)
            try:
                manifest.commit_versioned(
                    merged,
                    prices_path,
                    txn=(f"live-{source}", epoch_id),
                    expect_version=v,
                )
                break
            except manifest.CommitConflict:
                if attempt == 2:
                    raise
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
