"""Retransmission dedupe (T7): dropDuplicatesWithinWatermark keyed on
the business key drops feed-failover replays that arrive with a NEW
event timestamp — the case an exact-(symbol, ts) dropDuplicates misses
(reference behavior: update_live_price.py overwrites blindly, so a
replay silently rewrites the row)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from asset_prices_parquet_saver_spark.streaming.live import (
    dedupe_retransmissions,
)

SCHEMA = "symbol string, seq long, price double, ts timestamp"


def _row(symbol, seq, price, *dt):
    return Row(symbol=symbol, seq=seq, price=price, ts=datetime.datetime(*dt))


def test_replayed_keys_with_shifted_ts_are_dropped(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    batch = spark.createDataFrame(
        [
            _row("AAPL", 1, 10.0, 2024, 1, 2, 15, 0, 0),
            # same (symbol, seq) replayed 30s later with a different
            # receive-ts AND a different price: still the same trade
            _row("AAPL", 1, 10.5, 2024, 1, 2, 15, 0, 30),
            _row("AAPL", 2, 11.0, 2024, 1, 2, 15, 1, 0),
            _row("MSFT", 1, 5.0, 2024, 1, 2, 15, 0, 0),
        ],
        SCHEMA,
    )
    batch.coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    deduped = dedupe_retransmissions(
        stream, ["symbol", "seq"], lateness="10 minutes"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["symbol"], r["seq"]): r["price"]
        for r in spark.sql("SELECT * FROM dedup_out").collect()
    }
    assert rows == {
        ("AAPL", 1): 10.0,  # first-seen wins; the 10.5 replay is dropped
        ("AAPL", 2): 11.0,
        ("MSFT", 1): 5.0,
    }
