"""Structured Streaming live-price path (SURVEY §2.9)."""

from asset_prices_parquet_saver_spark.streaming.live import (
    dedupe_ticks_with_watermark,
    run_live_upsert,
)
from asset_prices_parquet_saver_spark.streaming.windows import (
    session_bars,
    tumbling_bars,
)

__all__ = [
    "dedupe_ticks_with_watermark",
    "run_live_upsert",
    "session_bars",
    "tumbling_bars",
]
