"""Daily-bars Python DataSource (S1/S2 as a first-class Spark source).

The reference's bulk download is a driver-side asyncio loop over
symbol batches (download_historical_price.py:309-336). The Spark-4
re-expression is the Python DataSource API: symbol batches become
planned ``InputPartition``s, so the cluster scheduler owns the
fan-out — 1000 executors each fetch their own slice, stragglers get
speculative retries, and the result is a plain DataFrame any
downstream operator composes with::

    spark.dataSource.register(DailyBarsDataSource)
    bars = (spark.read.format("daily_bars")
            .option("symbols", "AAPL,MSFT,BRK.B")
            .option("provider", "fake")          # alpaca | yfinance | fake
            .option("batch_size", "10")
            .load())

Providers:

- ``alpaca`` / ``yfinance`` — import-gated real clients (same request
  shapes and throttles as sources/fetchers.py; those SDKs are absent
  in this environment, so the paths raise ``FetcherUnavailable``);
- ``fake`` — a deterministic offline generator (md5-derived walk per
  symbol) that exercises the REAL DataSource machinery end-to-end:
  schema resolution, partition planning, per-partition readers, task
  retry idempotence (pure function of the partition).

Rate limits live inside each partition read, like the mapInPandas
fetchers: per-partition sleeps bound each task's request rate, so the
GLOBAL rate is capped by partitions × per-partition rate — set
``batch_size`` (symbols per partition) and the provider delays to
match the account's limit, exactly the knobs the reference exposes
(batch_size=10, 2 s — download_historical_price.py:322).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

#: DDL mirror of fetchers.RAW_BAR_SCHEMA (the DataSource API wants a
#: schema string / StructType from schema())
_BARS_DDL = (
    "symbol string, timestamp timestamp, open double, high double, "
    "low double, close double, adj_close double, volume double, "
    "trade_count double, vwap double"
)


class SymbolBatch(InputPartition):
    """One planned fetch unit: a bounded list of symbols (the
    reference's request batch), serialized to the executor."""

    def __init__(self, symbols: list[str]):
        self.symbols = symbols


def _fake_bars(symbol: str, n_days: int):
    """Deterministic offline bars: an md5-driven walk seeded by
    (symbol, day) — pure, so task retries and repeated reads are
    byte-identical (the property the test asserts)."""
    import datetime

    base = 20.0 + (int(hashlib.md5(symbol.encode()).hexdigest()[:8], 16) % 1000) / 10.0
    price = base
    for d in range(n_days):
        h = int(
            hashlib.md5(f"{symbol}:{d}".encode()).hexdigest()[:8], 16
        )
        step = ((h % 401) - 200) / 100.0  # [-2.00, +2.00] cents-exact
        o = round(price, 2)
        c = round(max(price + step, 1.0), 2)
        hi, lo = max(o, c), min(o, c)
        price = c
        yield (
            symbol,
            datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d),
            o,
            round(hi * 1.01, 2),
            round(lo * 0.99, 2),
            c,
            c,
            float(1000 + h % 9000),
            float(10 + h % 90),
            round((o + c) / 2.0, 2),
        )


class DailyBarsReader(DataSourceReader):
    def __init__(self, options):
        # DataSource options arrive lower-cased
        raw = options.get("symbols", "") or ""
        self.symbols = [s for s in (x.strip() for x in raw.split(",")) if s]
        if not self.symbols:
            raise ValueError(
                "daily_bars: option 'symbols' (comma-separated) is required"
            )
        self.provider = (options.get("provider") or "alpaca").lower()
        if self.provider not in ("alpaca", "yfinance", "fake"):
            raise ValueError(f"daily_bars: unknown provider {self.provider!r}")
        self.batch_size = int(options.get("batch_size", 10))
        self.n_days = int(options.get("fake_days", 30))
        self.delay = float(options.get("delay_seconds", 0))

    def partitions(self):
        b = max(self.batch_size, 1)
        return [
            SymbolBatch(self.symbols[i : i + b])
            for i in range(0, len(self.symbols), b)
        ]

    def read(self, partition: SymbolBatch):
        if self.provider == "fake":
            for sym in partition.symbols:
                yield from _fake_bars(sym, self.n_days)
            return
        yield from self._read_network(partition)  # pragma: no cover - SDKs absent

    def _read_network(self, partition):  # pragma: no cover - needs SDK+network
        import time

        from asset_prices_parquet_saver_spark.sources.fetchers import _require

        if self.provider == "alpaca":
            _require("alpaca")
            import datetime
            import os

            from alpaca.data.historical import StockHistoricalDataClient
            from alpaca.data.requests import StockBarsRequest
            from alpaca.data.timeframe import TimeFrame

            client = StockHistoricalDataClient(
                os.environ["APCA_API_KEY_ID"], os.environ["APCA_API_SECRET_KEY"]
            )
            if self.delay:
                time.sleep(self.delay)
            bars = client.get_stock_bars(
                StockBarsRequest(
                    symbol_or_symbols=[s.replace("-", ".") for s in partition.symbols],
                    timeframe=TimeFrame.Day,
                    start=datetime.datetime(1970, 1, 1),
                    adjustment="all",
                    feed="sip",
                )
            ).df
            if bars.empty:
                return
            out = bars.reset_index().rename(columns={"close": "adj_close"})
            out["close"] = out["adj_close"]
            for r in out.itertuples(index=False):
                yield (
                    r.symbol, r.timestamp, r.open, r.high, r.low, r.close,
                    r.adj_close, r.volume,
                    getattr(r, "trade_count", None), getattr(r, "vwap", None),
                )
        else:
            _require("yfinance")
            import yfinance as yf

            for sym in partition.symbols:
                if self.delay:
                    time.sleep(self.delay)
                h = yf.Ticker(sym.replace(".", "-")).history(
                    period="max", auto_adjust=False
                )
                if h.empty:
                    continue
                out = h.reset_index()
                for r in out.itertuples(index=False):
                    yield (
                        sym, getattr(r, "Date"), getattr(r, "Open"),
                        getattr(r, "High"), getattr(r, "Low"),
                        getattr(r, "Close"), getattr(r, "_5", None),
                        getattr(r, "Volume", None), None, None,
                    )


class DailyBarsDataSource(DataSource):
    """``spark.read.format("daily_bars")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "daily_bars"

    def schema(self) -> str:
        return _BARS_DDL

    def reader(self, schema) -> DataSourceReader:
        return DailyBarsReader(self.options)
