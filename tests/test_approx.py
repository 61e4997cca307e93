"""Approximate (sketch) aggregates: accuracy bounds vs exact values."""

from __future__ import annotations

from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.plans import QUERIES
from asset_prices_parquet_saver_spark.sources.tables import read_table


def test_approx_distinct_within_5pct(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.approx_users
        for r in QUERIES["approx_user_stats"](spark, sf_dir).collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(1, 0.05 * n), (k, approx[k], n)


def test_approx_median_within_tolerance(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.m
        for r in ev.groupBy("event_type")
        .agg(F.percentile("value", F.lit(0.5)).alias("m"))
        .collect()
    }
    approx = {
        r.event_type: r.approx_median
        for r in QUERIES["approx_user_stats"](spark, sf_dir).collect()
    }
    for k, m in exact.items():
        # percentile_approx with 10k accuracy returns an actual data
        # value near the true median
        assert abs(approx[k] - m) <= max(0.5, 0.05 * abs(m)), (k, approx[k], m)
