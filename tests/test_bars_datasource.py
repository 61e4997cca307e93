"""Python DataSource for daily bars (S1/S2 as spark.read.format):
partition planning, determinism, and composition with the normalizer."""

from __future__ import annotations

import pytest

from asset_prices_parquet_saver_spark.sources.bars_datasource import (
    DailyBarsDataSource,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(DailyBarsDataSource)
    return spark


def _read(spark, symbols, **opts):
    r = (
        spark.read.format("daily_bars")
        .option("symbols", symbols)
        .option("provider", "fake")
    )
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_fake_provider_schema_and_rows(registered, spark):
    df = _read(spark, "AAPL,MSFT,BRK.B", fake_days=5)
    assert [f.name for f in df.schema.fields] == [
        "symbol", "timestamp", "open", "high", "low", "close",
        "adj_close", "volume", "trade_count", "vwap",
    ]
    rows = df.collect()
    assert len(rows) == 15  # 3 symbols × 5 days
    assert {r.symbol for r in rows} == {"AAPL", "MSFT", "BRK.B"}
    for r in rows:
        assert r.high >= max(r.open, r.close) - 1e-9
        assert r.low <= min(r.open, r.close) + 1e-9


def test_partition_planning_matches_batch_size(registered, spark):
    # 5 symbols, batch_size 2 → 3 planned partitions → 3 Spark tasks
    df = _read(spark, "A,B,C,D,E", batch_size=2, fake_days=1)
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 5


def test_reads_are_deterministic(registered, spark):
    a = sorted(map(tuple, _read(spark, "AAPL,MSFT", fake_days=10).collect()))
    b = sorted(map(tuple, _read(spark, "AAPL,MSFT", fake_days=10).collect()))
    assert a == b  # pure partition function → retry/replay identical


def test_composes_with_normalizer(registered, spark):
    from asset_prices_parquet_saver_spark.operators.normalize import (
        normalize_bars,
    )

    raw = _read(spark, "AAPL", fake_days=3)
    out = normalize_bars(raw.withColumnRenamed("adj_close", "Adj Close"), source="fake")
    assert out.count() == 3
    assert "adj_close" in out.columns


def test_missing_symbols_option_is_loud(registered, spark):
    with pytest.raises(Exception, match="symbols"):
        (
            spark.read.format("daily_bars")
            .option("provider", "fake")
            .load()
            .count()
        )
