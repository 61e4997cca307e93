"""applyInPandasWithState: per-symbol running snapshot across batches."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from asset_prices_parquet_saver_spark.schema import LIVE_TRADE_SCHEMA
from asset_prices_parquet_saver_spark.streaming.stateful import running_price_state


def _tick(symbol, price, *dt):
    return Row(symbol=symbol, price=price, ts=datetime.datetime(*dt))


def test_running_state_across_batches(spark, tmp_path):
    ticks_dir = tmp_path / "ticks"
    ticks_dir.mkdir()
    checkpoint = str(tmp_path / "ckpt")

    first = [
        _tick("AAPL", 10.0, 2024, 1, 2, 9, 0, 0),
        _tick("AAPL", 12.0, 2024, 1, 2, 10, 0, 0),
        _tick("AAPL", 8.0, 2024, 1, 2, 9, 30, 0),  # out of order, not last
        _tick("MSFT", 5.0, 2024, 1, 2, 9, 0, 0),
        Row(symbol="BAD", price=None, ts=datetime.datetime(2024, 1, 2)),
    ]
    second = [_tick("AAPL", 11.0, 2024, 1, 2, 11, 0, 0)]
    for batch in (first, second):
        spark.createDataFrame(batch, LIVE_TRADE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(ticks_dir))

    # maxFilesPerTrigger=1 → each file is its own micro-batch, so the
    # second batch exercises state carried over from the first
    stream = (
        spark.readStream.schema(LIVE_TRADE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ticks_dir))
    )
    q = (
        running_price_state(stream)
        .writeStream.format("memory")
        .queryName("snap")
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 2, "expected one micro-batch per file"

    # update mode emits one snapshot row per key per batch; the final
    # state is the row with the highest tick count per symbol
    emitted = spark.sql("SELECT * FROM snap").collect()
    rows = {}
    for r in emitted:
        if r.symbol not in rows or r.n_ticks > rows[r.symbol].n_ticks:
            rows[r.symbol] = r

    aapl = rows["AAPL"]
    assert aapl.n_ticks == 4  # 3 from batch 1 + 1 from batch 2
    assert aapl.last_price == 11.0  # ts 11:00 is globally latest
    assert aapl.min_price == 8.0 and aapl.max_price == 12.0
    assert rows["MSFT"].n_ticks == 1 and rows["MSFT"].last_price == 5.0
    assert "BAD" not in rows  # P7 validity filter inside the operator


def test_ewma_state_across_batches_matches_batch_fold(spark, tmp_path):
    """Streaming EWMA with event-time-ordered batch boundaries must
    equal the batch recurrence over the concatenated sequence, carrying
    state (not reseeding) across micro-batches; NULL ticks are dropped
    by the validity guard."""
    from asset_prices_parquet_saver_spark.streaming.stateful import (
        ewma_price_state,
    )

    ticks_dir = tmp_path / "ticks"
    ticks_dir.mkdir()
    checkpoint = str(tmp_path / "ckpt_ewma")

    first = [
        _tick("AAPL", 10.0, 2024, 1, 2, 9, 0, 0),
        _tick("AAPL", 12.0, 2024, 1, 2, 10, 0, 0),
        _tick("MSFT", 5.0, 2024, 1, 2, 9, 0, 0),
        Row(symbol="BAD", price=None, ts=datetime.datetime(2024, 1, 2)),
    ]
    second = [
        _tick("AAPL", 11.0, 2024, 1, 2, 11, 0, 0),
        _tick("MSFT", 7.0, 2024, 1, 2, 11, 0, 0),
    ]
    for batch in (first, second):
        spark.createDataFrame(batch, LIVE_TRADE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(ticks_dir))

    stream = (
        spark.readStream.schema(LIVE_TRADE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ticks_dir))
    )
    q = (
        ewma_price_state(stream, alpha=0.2)
        .writeStream.format("memory")
        .queryName("ewma_snap")
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 2

    rows = {}
    for r in spark.sql("SELECT * FROM ewma_snap").collect():
        if r.symbol not in rows or r.n_ticks > rows[r.symbol].n_ticks:
            rows[r.symbol] = r

    def fold(prices, a=0.2):
        e = None
        for p in prices:
            e = p if e is None else a * p + (1.0 - a) * e
        return e

    assert rows["AAPL"].n_ticks == 3
    assert rows["AAPL"].ewma == fold([10.0, 12.0, 11.0])  # bit-exact
    assert rows["MSFT"].n_ticks == 2
    assert rows["MSFT"].ewma == fold([5.0, 7.0])
    assert "BAD" not in rows
