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


def test_orc_micros_fingerprint_survives_hostile_jvm_tz(tmp_path):
    """The orc_roundtrip_orders gate lane, executed in a SUBPROCESS
    whose process TZ, JVM user.timezone, and Spark session tz are all
    forced to a DST-bearing non-UTC zone: the BIGINT unix_micros
    fingerprint must equal the UTC-host value — i.e. the gate survives
    any harness environment (the r10 driver red was
    environment-coupled through the rendered-timestamp lane)."""
    import json
    import os
    import subprocess
    import sys

    script = r"""
import json, sys
from pyspark.sql import SparkSession, functions as F
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.driver.extraJavaOptions",
            "-Duser.timezone=America/New_York")
    .config("spark.executor.extraJavaOptions",
            "-Duser.timezone=America/New_York")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from asset_prices_parquet_saver_spark.sources import interchange as ix
from asset_prices_parquet_saver_spark.sources.tables import read_table
o = read_table(spark, "/root/testdata/sf0.001", "orders")
back = ix.roundtrip_orc(spark, o, sys.argv[1])
rows = (
    back.groupBy("o_orderstatus")
    .agg(
        F.count(F.lit(1)).alias("n"),
        F.unix_micros(F.min("o_orderdate").cast("timestamp_ltz"))
        .alias("lo"),
        F.unix_micros(F.max("o_orderdate").cast("timestamp_ltz"))
        .alias("hi"),
    )
    .collect()
)
print("FP=" + json.dumps(sorted([r.o_orderstatus, r.n, r.lo, r.hi]
                                for r in rows)))
"""
    env = dict(os.environ, TZ="America/New_York")
    out = subprocess.run(
        [sys.executable, "-c", script, str(tmp_path / "orc_tz")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("FP=")][0]
    got = json.loads(line[3:])

    import duckdb

    want = duckdb.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n,
               epoch_us(MIN(o_orderdate)) AS lo,
               epoch_us(MAX(o_orderdate)) AS hi
        FROM read_parquet('/root/testdata/sf0.001/orders.parquet')
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert got == sorted([list(r) for r in want])
