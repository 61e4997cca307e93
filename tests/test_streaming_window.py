"""Streaming windowed aggregation with watermark (T7; SURVEY §2.9):
the 1-day tumbling window implicit in the reference's date-keyed upsert
(update_live_price.py:250-274) as an explicit event-time aggregation."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.schema import LIVE_TRADE_SCHEMA


def _tick(symbol, price, *dt):
    return Row(symbol=symbol, price=price, ts=datetime.datetime(*dt))


def test_session_window_gap_grouping(spark, tmp_path):
    """F.session_window: gap-based event grouping on a stream — the
    streaming analogue of the batch user_sessions query."""
    ticks_dir = tmp_path / "sticks"
    ticks_dir.mkdir()
    ticks = [
        _tick("AAPL", 1.0, 2024, 1, 2, 9, 0, 0),
        _tick("AAPL", 2.0, 2024, 1, 2, 9, 10, 0),  # same session (gap 10m < 30m)
        _tick("AAPL", 3.0, 2024, 1, 2, 11, 0, 0),  # new session (gap 110m)
        _tick("MSFT", 9.0, 2024, 1, 2, 9, 5, 0),
    ]
    spark.createDataFrame(ticks, LIVE_TRADE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(ticks_dir))
    stream = spark.readStream.schema(LIVE_TRADE_SCHEMA).parquet(str(ticks_dir))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("symbol", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r.symbol, r.sw.start.isoformat(), r.n)
        for r in spark.sql("SELECT * FROM sessions_stream").collect()
    )
    assert rows == [
        ("AAPL", "2024-01-02T09:00:00", 2),
        ("AAPL", "2024-01-02T11:00:00", 1),
        ("MSFT", "2024-01-02T09:05:00", 1),
    ]


def test_tumbling_window_counts_with_watermark(spark, tmp_path):
    ticks_dir = tmp_path / "ticks"
    ticks_dir.mkdir()
    ticks = [
        _tick("AAPL", 10.0, 2024, 1, 2, 9, 0, 0),
        _tick("AAPL", 11.0, 2024, 1, 2, 15, 0, 0),
        _tick("AAPL", 12.0, 2024, 1, 3, 9, 0, 0),
        _tick("MSFT", 5.0, 2024, 1, 2, 10, 0, 0),
    ]
    spark.createDataFrame(ticks, LIVE_TRADE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(ticks_dir))

    stream = spark.readStream.schema(LIVE_TRADE_SCHEMA).parquet(str(ticks_dir))
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy("symbol", F.window("ts", "1 day").alias("w"))
        .agg(
            F.count("*").alias("n_ticks"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("daily_bars")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r.symbol, r.w.start.date().isoformat()): r
        for r in spark.sql("SELECT * FROM daily_bars").collect()
    }
    assert rows[("AAPL", "2024-01-02")].n_ticks == 2
    assert rows[("AAPL", "2024-01-02")].high == 11.0
    assert rows[("AAPL", "2024-01-03")].n_ticks == 1
    assert rows[("MSFT", "2024-01-02")].low == 5.0


def test_windows_operators_batch_and_stream_parity(spark, tmp_path):
    """streaming/windows.py: the same operator runs on batch and
    streaming frames and produces identical bars."""
    from asset_prices_parquet_saver_spark.streaming.windows import (
        session_bars,
        tumbling_bars,
    )

    ticks = [
        _tick("AAPL", 5.0, 2024, 1, 2, 9, 0, 0),
        _tick("AAPL", 1.0, 2024, 1, 2, 9, 10, 0),
        _tick("AAPL", 3.0, 2024, 1, 3, 11, 0, 0),
        _tick("MSFT", 9.0, 2024, 1, 2, 9, 5, 0),
    ]
    batch = spark.createDataFrame(ticks, LIVE_TRADE_SCHEMA)

    tb = {
        (r.symbol, r.window_start.date().isoformat()): (r.open, r.high, r.low, r.close, r.n_ticks)
        for r in tumbling_bars(batch).collect()
    }
    assert tb[("AAPL", "2024-01-02")] == (5.0, 5.0, 1.0, 1.0, 2)
    assert tb[("AAPL", "2024-01-03")] == (3.0, 3.0, 3.0, 3.0, 1)
    assert tb[("MSFT", "2024-01-02")] == (9.0, 9.0, 9.0, 9.0, 1)

    sb = {
        (r.symbol, r.session_start.isoformat()): r.n_ticks
        for r in session_bars(batch).collect()
    }
    assert sb == {
        ("AAPL", "2024-01-02T09:00:00"): 2,
        ("AAPL", "2024-01-03T11:00:00"): 1,
        ("MSFT", "2024-01-02T09:05:00"): 1,
    }

    # same operator on a stream
    ticks_dir = tmp_path / "wticks"
    ticks_dir.mkdir()
    batch.coalesce(1).write.mode("append").parquet(str(ticks_dir))
    stream = spark.readStream.schema(LIVE_TRADE_SCHEMA).parquet(str(ticks_dir))
    q = (
        tumbling_bars(stream)
        .writeStream.format("memory")
        .queryName("tumbling_bars_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.symbol, r.window_start.date().isoformat()): (r.open, r.high, r.low, r.close, r.n_ticks)
        for r in spark.sql("SELECT * FROM tumbling_bars_stream").collect()
    }
    assert got == tb
