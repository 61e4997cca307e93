"""Unit tests for the bar-schema normalizer (P1-P5, P9-P13)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from asset_prices_parquet_saver_spark.operators.normalize import normalize_bars
from asset_prices_parquet_saver_spark.schema import BAR_SCHEMA

UTC = datetime.timezone.utc


def test_yfinance_shape_normalizes(spark):
    raw = spark.createDataFrame(
        [
            Row(
                Symbol="brk-b",
                Timestamp=datetime.datetime(2024, 1, 2, 12, 30, 45, 678901),
                Open=1.0,
                High=2.0,
                Low=0.5,
                **{"Adj Close": 1.5},
                Volume=100.0,
            )
        ]
    )
    out = normalize_bars(raw, "yfinance")
    assert [f.name for f in out.schema.fields] == [f.name for f in BAR_SCHEMA.fields]
    row = out.collect()[0]
    assert row.symbol == "BRK.B"  # upper + '-'→'.' (P9/P10)
    assert row.adj_close == 1.5  # 'adj close' → adj_close (P1)
    assert row.trade_count is None and row.vwap is None  # P5 pad
    assert row.timestamp.microsecond == 0  # P11 floor to second
    assert row.source == "yfinance"


def test_alpaca_close_renames_to_adj_close(spark):
    raw = spark.createDataFrame(
        [
            Row(
                symbol="AAPL",
                timestamp=datetime.datetime(2024, 1, 2),
                close=123.0,
                volume=10.0,
                trade_count=5.0,
                vwap=122.5,
            )
        ]
    )
    out = normalize_bars(raw, "alpaca").collect()[0]
    assert out.adj_close == 123.0
    assert out.open is None and out.high is None and out.low is None


def test_idempotent(spark):
    raw = spark.createDataFrame(
        [
            Row(
                symbol="MSFT",
                timestamp=datetime.datetime(2024, 1, 2),
                close=1.0,
            )
        ]
    )
    once = normalize_bars(raw, "alpaca")
    twice = normalize_bars(once, "alpaca")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_adj_close_wins_over_close(spark):
    raw = spark.createDataFrame(
        [
            Row(
                symbol="X",
                timestamp=datetime.datetime(2024, 1, 2),
                close=1.0,
                adj_close=2.0,
            )
        ]
    )
    assert normalize_bars(raw, "yfinance").collect()[0].adj_close == 2.0
