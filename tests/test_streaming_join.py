"""Stream-stream and stream-static joins (SURVEY §2.9 streaming
surface): the watermarked interval join — quotes enriched with the
latest-known reference record within a bounded time range — and the
static-dimension enrichment join. Both watermarks bound the join state
Spark buffers, which is what makes the operator runnable forever at
100 TB/day: state is O(watermark window), not O(stream history)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

TICK_SCHEMA = "symbol string, price double, ts timestamp"
REF_SCHEMA = "symbol string, rating string, rts timestamp"


def _t(*dt):
    return datetime.datetime(*dt)


def test_stream_stream_interval_join(spark, tmp_path):
    """Each tick joins reference rows for the same symbol whose
    timestamp lies within [tick - 1h, tick] — the bounded-state
    stream-stream equi+range join."""
    ticks_dir = tmp_path / "ticks"
    refs_dir = tmp_path / "refs"
    ticks_dir.mkdir()
    refs_dir.mkdir()
    spark.createDataFrame(
        [
            Row(symbol="AAPL", price=10.0, ts=_t(2024, 1, 2, 10, 0, 0)),
            Row(symbol="AAPL", price=11.0, ts=_t(2024, 1, 2, 12, 0, 0)),
            Row(symbol="MSFT", price=5.0, ts=_t(2024, 1, 2, 10, 30, 0)),
        ],
        TICK_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(ticks_dir))
    spark.createDataFrame(
        [
            Row(symbol="AAPL", rating="buy", rts=_t(2024, 1, 2, 9, 30, 0)),
            Row(symbol="AAPL", rating="hold", rts=_t(2024, 1, 2, 11, 45, 0)),
            Row(symbol="MSFT", rating="sell", rts=_t(2024, 1, 2, 8, 0, 0)),  # > 1h before
        ],
        REF_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(refs_dir))

    ticks = (
        spark.readStream.schema(TICK_SCHEMA)
        .parquet(str(ticks_dir))
        .withWatermark("ts", "2 hours")
    )
    refs = (
        spark.readStream.schema(REF_SCHEMA)
        .parquet(str(refs_dir))
        .withWatermark("rts", "2 hours")
    )
    joined = ticks.join(
        refs,
        (ticks.symbol == refs.symbol)
        & (refs.rts >= ticks.ts - F.expr("INTERVAL 1 HOUR"))
        & (refs.rts <= ticks.ts),
        "inner",
    ).select(ticks.symbol, "price", "ts", "rating", "rts")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["symbol"], r["price"], r["rating"])
        for r in spark.sql("SELECT * FROM ssj").collect()
    }
    # AAPL@10:00 matches the 9:30 rating; AAPL@12:00 matches 11:45;
    # MSFT's only rating is 2.5h old — outside the interval, no row.
    assert got == {("AAPL", 10.0, "buy"), ("AAPL", 11.0, "hold")}


def test_stream_static_dimension_enrichment(spark, tmp_path):
    """Stream-static join: the static side is re-resolved per batch,
    broadcast when small — the dimension-enrichment path that needs no
    state at all."""
    ticks_dir = tmp_path / "ticks"
    ticks_dir.mkdir()
    spark.createDataFrame(
        [
            Row(symbol="AAPL", price=10.0, ts=_t(2024, 1, 2, 10, 0, 0)),
            Row(symbol="XXXX", price=1.0, ts=_t(2024, 1, 2, 10, 0, 0)),
        ],
        TICK_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(ticks_dir))
    dim = spark.createDataFrame(
        [("AAPL", "tech")], "symbol string, sector string"
    )
    ticks = spark.readStream.schema(TICK_SCHEMA).parquet(str(ticks_dir))
    enriched = ticks.join(F.broadcast(dim), "symbol", "left").select(
        "symbol", "price", "sector"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("ssd")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["symbol"], r["sector"]) for r in spark.sql("SELECT * FROM ssd").collect()}
    assert got == {("AAPL", "tech"), ("XXXX", None)}
