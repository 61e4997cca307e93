"""PySpark-native analytics engine with the capabilities of
JeremyWhittaker/asset-prices-parquet-saver, re-expressed Spark-first.

The reference (a pandas batch+live ETL pipeline for per-symbol OHLCV
Parquet files) is re-architected as lazy DataFrame programs over a single
partitioned ``prices`` dataset, plus the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal plumbing)
a 100 TB pipeline needs.

Layout:
    session     SparkSession factory (UTC, AQE, Arrow)
    schema      canonical StructTypes (bars, ticks, symbols, status)
    sources/    parquet table IO, symbol-universe sources, status table
    operators/  normalize, merge/upsert, symbols, compare, details,
                dedup, similarity, text, multimodal
    functions/  deterministic numeric/scalar helpers (decimal-exact aggs)
    plans/      the query registry driving __spark_entry__ and bench.py
    streaming/  Structured Streaming live-price path (foreachBatch merge)
"""

from asset_prices_parquet_saver_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
