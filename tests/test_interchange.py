"""ORC interchange (sources/interchange.py): roundtrip fidelity across
type lanes, schema pinning, partitioned export, avro gating."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.sources import interchange as ix
from asset_prices_parquet_saver_spark.sources.tables import read_table


def test_orc_roundtrip_exact_rows(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "a|b", 1.5, datetime.datetime(2024, 1, 2, 3, 4, 5), None),
            (2, None, float("inf"), None, b"\x00\xff"),
            (3, "", -0.0, datetime.datetime(1970, 1, 1), b""),
        ],
        "id BIGINT, s STRING, d DOUBLE, ts TIMESTAMP, raw BINARY",
    )
    back = ix.roundtrip_orc(spark, df, str(tmp_path / "orc"))
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_orc_roundtrip_events_volume(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").drop("props")
    back = ix.roundtrip_orc(spark, ev, str(tmp_path / "ev"))
    a = ev.agg(
        F.count(F.lit(1)), F.sum("event_id"),
        F.sum(F.col("value").cast("decimal(38,6)")),
        F.min("ts"), F.max("ts"),
    ).collect()[0]
    b = back.agg(
        F.count(F.lit(1)), F.sum("event_id"),
        F.sum(F.col("value").cast("decimal(38,6)")),
        F.min("ts"), F.max("ts"),
    ).collect()[0]
    assert tuple(a) == tuple(b)


def test_orc_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "x" if i % 2 else "y") for i in range(10)], "id INT, part STRING"
    )
    ix.write_orc(df, str(tmp_path / "p"), partition_by=["part"])
    back = ix.read_orc(spark, str(tmp_path / "p")).filter(F.col("part") == "x")
    assert back.count() == 5
    # partition pruning visible in the scan (directory-level filter)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "part" in plan


def test_avro_gated_with_clear_error(spark):
    with pytest.raises(ImportError, match="spark-avro"):
        ix.write_avro(None, "/tmp/nope")
