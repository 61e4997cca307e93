"""Event-time windowed aggregations over tick streams (T7; SURVEY §2.9).

The reference's date-keyed upsert (update_live_price.py:250-274) is an
implicit 1-day tumbling window; these operators make the windowing
explicit and add the gap-based session variant. Both carry a watermark
so streaming state is bounded: windows older than the lateness horizon
are finalized and evicted.

These are thin, typed wrappers over ``F.window`` / ``F.session_window``
— the point is a stable public operator surface (batch or streaming
DataFrames both work; Catalyst plans the same aggregation either way).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default per-window bar aggregates (OHLCV from a (price, ts) stream).
#: open/close select by the (ts, price) struct order, not bare ts:
#: min_by/max_by pick an ARBITRARY row among equal timestamps, so a
#: replay of the same data could emit different open/close (the same
#: determinism rule as analytics.ohlc_bars and merge.py's tie-breaks).
def _bar_aggs() -> list[Column]:
    sel = F.struct(F.col("ts"), F.col("price").alias("p"))
    return [
        F.min(sel).getField("p").alias("open"),
        F.max("price").alias("high"),
        F.min("price").alias("low"),
        F.max(sel).getField("p").alias("close"),
        F.count("*").alias("n_ticks"),
    ]


def _valid_ticks(ticks: DataFrame) -> DataFrame:
    """P7 validity filter: a NULL-price tick would otherwise yield
    NULL open/close while still counting in n_ticks; NULL ts cannot be
    windowed. Every other tick consumer filters first — so do the
    window wrappers."""
    return ticks.filter(F.col("price").isNotNull() & F.col("ts").isNotNull())


def tumbling_bars(
    ticks: DataFrame,
    window: str = "1 day",
    lateness: str = "1 day",
    keys: Sequence[str] = ("symbol",),
) -> DataFrame:
    """OHLC bars per (keys, tumbling event-time window).

    On a stream: watermark bounds state and finalizes bars ``lateness``
    after window end. On a batch frame: the same plan, one shuffle on
    (keys, window).
    """
    ticks = _valid_ticks(ticks)
    src = ticks.withWatermark("ts", lateness) if ticks.isStreaming else ticks
    return (
        src.groupBy(*keys, F.window("ts", window).alias("w"))
        .agg(*_bar_aggs())
        .select(
            *keys,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "open", "high", "low", "close", "n_ticks",
        )
    )


def session_bars(
    ticks: DataFrame,
    gap: str = "30 minutes",
    lateness: str = "1 hour",
    keys: Sequence[str] = ("symbol",),
) -> DataFrame:
    """Gap-based session aggregation (``F.session_window``): a session
    closes after ``gap`` of per-key inactivity — the streaming analogue
    of the batch ``user_sessions`` query's lag+cumsum sessionization."""
    ticks = _valid_ticks(ticks)
    src = ticks.withWatermark("ts", lateness) if ticks.isStreaming else ticks
    return (
        src.groupBy(*keys, F.session_window("ts", gap).alias("sw"))
        .agg(*_bar_aggs())
        .select(
            *keys,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "open", "high", "low", "close", "n_ticks",
        )
    )
