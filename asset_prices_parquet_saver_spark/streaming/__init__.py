"""Structured Streaming live-price path (SURVEY §2.9)."""

from asset_prices_parquet_saver_spark.streaming.live import (
    dedupe_ticks_with_watermark,
    run_live_upsert,
)

__all__ = ["dedupe_ticks_with_watermark", "run_live_upsert"]
