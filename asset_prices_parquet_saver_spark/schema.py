"""Canonical schemas (SURVEY §1).

The reference fixes its bar schema by convention: the live updater
enumerates ``['open','high','low','adj_close','volume','trade_count',
'vwap']`` at update_live_price.py:245 and pads missing columns with NaN;
symbol identity lives in the file name. Here symbol/source are first-class
columns of one partitioned dataset.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Bar value columns, in canonical order (update_live_price.py:245).
BAR_VALUE_COLUMNS = ["open", "high", "low", "adj_close", "volume", "trade_count", "vwap"]

#: Full canonical bar table: one row per (source, symbol, trading day).
BAR_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
    ]
    + [T.StructField(c, T.DoubleType(), True) for c in BAR_VALUE_COLUMNS]
)

#: Raw live trade tick (update_live_price.py:153-157: ``trade.get('p')``
#: price and ``trade.get('t')`` timestamp keyed by symbol).
LIVE_TRADE_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

#: Symbol universe row (download_historical_price.py:146-193,
#: update_live_price.py:92-103).
SYMBOL_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("exchange", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("tradable", T.BooleanType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)

#: Status/blacklist table replacing the reference's txt side files
#: (download_historical_price.py:114-144, update_live_price.py:71-90).
SYMBOL_STATUS_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # 'invalid' | 'no_data'
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

#: Multimodal media row: opaque binary payload + typed metadata
#: (driver-mandated extension; no reference analogue).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # 'image'|'audio'|'video'
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

#: Driver star-schema table names at /root/testdata/sf*/ (TESTDATA.md).
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
