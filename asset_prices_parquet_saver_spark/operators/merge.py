"""Keep-latest merge / upsert operators (J4, A3, A4; SURVEY §2.3-2.4).

The reference's live upsert (update_live_price.py:250-274) works on one
symbol file at a time: if a bar for the trade's calendar date exists,
overwrite only ``adj_close`` in place (:254-258); else append a new row
whose other OHLCV columns are NaN (:259-274); result kept sorted (:283).

Spark-first re-expression: the whole upsert is one relational program —
reduce ticks to last-per-(symbol, day) with a window, then a full-outer
merge with ``coalesce`` per column. No per-file read-modify-write; at
cluster scale the shuffle is keyed on (symbol, day) and AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.schema import BAR_SCHEMA, BAR_VALUE_COLUMNS


def keep_latest(df: DataFrame, keys: list[str], order_by: list) -> DataFrame:
    """Deterministic keep-one-row-per-key: row_number()=1 over keys
    ordered by ``order_by`` (pass fully tie-broken ordering)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_ticks_per_day(ticks: DataFrame) -> DataFrame:
    """P7 validity filter + last tick per (symbol, calendar day).

    Mirrors update_live_price.py:160-168 (drop NULL price/ts) and the
    last-write-wins-per-date semantics of :250-258. The full tie-break
    (ts desc, price desc) makes the survivor deterministic even for
    ticks sharing a second-truncated timestamp — required for the
    exactly-once foreachBatch sink, whose replay after a task retry
    must reproduce the same adj_close.
    """
    valid = ticks.filter(F.col("price").isNotNull() & F.col("ts").isNotNull())
    valid = valid.withColumn("ts", F.date_trunc("second", F.col("ts")))
    valid = valid.withColumn("day", F.to_date("ts"))
    return keep_latest(
        valid, ["symbol", "day"], [F.col("ts").desc(), F.col("price").desc()]
    )


def upsert_live_prices(prices: DataFrame, ticks: DataFrame, source: str = "alpaca") -> DataFrame:
    """Merge live ticks into the bar table (J4).

    Exactly the reference's semantics (update_live_price.py:250-274):
    existing (symbol, day) row → only adj_close replaced; new day →
    new row with all other value columns NULL and timestamp = the day
    (midnight UTC, matching the normalized index at :239-252).
    """
    latest = latest_ticks_per_day(ticks).select(
        F.col("symbol"),
        F.col("day"),
        F.col("price").alias("__new_adj_close"),
    )
    pr = prices.filter(F.col("source") == source).withColumn(
        "day", F.to_date("timestamp")
    )
    other = prices.filter(F.col("source") != source)

    joined = pr.alias("p").join(latest.alias("t"), ["symbol", "day"], "full_outer")
    merged = joined.select(
        F.lit(source).alias("source"),
        F.col("symbol"),
        F.coalesce(F.col("p.timestamp"), F.col("day").cast("timestamp")).alias(
            "timestamp"
        ),
        *[
            (
                F.coalesce(F.col("t.__new_adj_close"), F.col(f"p.{c}")).alias(c)
                if c == "adj_close"
                else F.col(f"p.{c}").alias(c)
            )
            for c in BAR_VALUE_COLUMNS
        ],
    )
    return other.unionByName(merged.select([f.name for f in BAR_SCHEMA.fields]))


def last_price_per_symbol(prices: DataFrame) -> DataFrame:
    """A3/J5: the reference's in-memory ``current_prices`` snapshot
    (update_live_price.py:69, :164) as a keyed aggregation."""
    latest = keep_latest(
        prices.filter(F.col("adj_close").isNotNull()),
        ["symbol"],
        [F.col("timestamp").desc(), F.col("source").asc()],
    )
    return latest.select("symbol", F.col("adj_close").alias("price"), "timestamp")
