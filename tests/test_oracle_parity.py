"""Local mirror of the driver's DuckDB-oracle differential gate
(SURVEY §5.1): run every registered query via Spark AND its oracle SQL
via DuckDB on the same parquet, compare row count, column names, and
exact values (order-insensitive).

Stricter than tolerance-based comparison on purpose — the driver hashes
values, so anything but exact equality (after the engineered decimal/
rounding determinism) is a failure here too.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

from asset_prices_parquet_saver_spark.plans import ORACLE, QUERIES
from asset_prices_parquet_saver_spark.schema import TESTDATA_TABLES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _rows(rows):
    normed = [tuple(_norm(v) for v in r) for r in rows]
    # None-safe total order so NULL-bearing rows (e.g. ROLLUP) sort
    return sorted(normed, key=lambda r: tuple((v is None, str(v)) for v in r))


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(ORACLE[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert spark_cols == duck_cols, f"{name}: columns {spark_cols} != {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} != {len(duck_rows)}"
    )
    srt, drt = _rows(spark_rows), _rows(duck_rows)
    mismatches = [
        (a, b) for a, b in zip(srt, drt) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0
