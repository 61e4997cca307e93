"""Tests for the nearest-timestamp as-of join (SURVEY §2.3 extension).

Semantics under test (mirroring DuckDB ``ASOF LEFT JOIN`` with
``left.ts >= right.ts``): every left row survives; it carries the
values of the latest right row at-or-before its timestamp within the
same key group, NULL when none exists; equal timestamps match
(inclusive bound).  Plan shape: one shuffle on the keys, no range
cross-product.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row

from asset_prices_parquet_saver_spark.operators.asof import asof_join


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", probe_id=1, ts=_ts(1, 12)),   # after bar day1 → day1
            Row(k="a", probe_id=2, ts=_ts(3)),       # equal to bar day3 → day3 (inclusive)
            Row(k="a", probe_id=3, ts=_ts(2, 23)),   # between bars → day1
            Row(k="b", probe_id=4, ts=_ts(1)),       # before any b bar → NULL
            Row(k="b", probe_id=5, ts=_ts(9)),       # after last b bar → day5
            Row(k="c", probe_id=6, ts=_ts(4)),       # key with no bars at all → NULL
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", bar_ts=_ts(1), px=10.0),
            Row(k="a", bar_ts=_ts(3), px=30.0),
            Row(k="b", bar_ts=_ts(5), px=50.0),
        ]
    )
    return left, right


def test_asof_semantics(frames):
    left, right = frames
    out = asof_join(left, right, ["k"], "ts", "bar_ts", ["px"])
    got = {r.probe_id: (r.asof_ts, r.px) for r in out.collect()}
    assert got == {
        1: (_ts(1), 10.0),
        2: (_ts(3), 30.0),   # inclusive >= at equal ts
        3: (_ts(1), 10.0),
        4: (None, None),     # left-join: no prior bar
        5: (_ts(5), 50.0),
        6: (None, None),     # key absent from right entirely
    }
    assert out.count() == left.count()


def test_asof_preserves_left_payload_and_schema(frames):
    left, right = frames
    out = asof_join(left, right, ["k"], "ts", "bar_ts", ["px"])
    assert set(out.columns) == {"k", "ts", "probe_id", "asof_ts", "px"}
    assert dict(out.dtypes)["ts"] == dict(left.dtypes)["ts"]
    assert dict(out.dtypes)["px"] == dict(right.dtypes)["px"]


def test_asof_plan_single_shuffle_no_cartesian(frames):
    left, right = frames
    out = asof_join(left, right, ["k"], "ts", "bar_ts", ["px"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # union + one window: exactly one exchange hash-partitioned on the key
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property check vs an independent reference: pandas merge_asof
    (direction='backward', allow_exact_matches=True) on randomized
    per-key event sets, including duplicate left timestamps and keys
    with zero bars."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    base = datetime.datetime(2024, 1, 1)
    left_rows, right_rows = [], []
    pid = 0
    for k in "abcdef":
        for _ in range(rng.integers(5, 30)):
            left_rows.append(
                Row(k=k, probe_id=pid, ts=base + datetime.timedelta(minutes=int(rng.integers(0, 5000))))
            )
            pid += 1
        if k != "f":  # key 'f' has no right rows at all
            for m in sorted(rng.choice(5000, size=rng.integers(1, 10), replace=False).tolist()):
                right_rows.append(
                    Row(k=k, bar_ts=base + datetime.timedelta(minutes=int(m)), px=float(m))
                )
    left = spark.createDataFrame(left_rows)
    right = spark.createDataFrame(right_rows)
    got = {
        r.probe_id: (r.asof_ts, r.px)
        for r in asof_join(left, right, ["k"], "ts", "bar_ts", ["px"]).collect()
    }

    lp = pd.DataFrame([r.asDict() for r in left_rows]).sort_values("ts")
    rp = pd.DataFrame([r.asDict() for r in right_rows]).sort_values("bar_ts")
    ref = pd.merge_asof(
        lp, rp, left_on="ts", right_on="bar_ts", by="k",
        direction="backward", allow_exact_matches=True,
    )
    want = {
        int(row.probe_id): (
            None if pd.isna(row.bar_ts) else row.bar_ts.to_pydatetime(),
            None if pd.isna(row.px) else float(row.px),
        )
        for row in ref.itertuples()
    }
    assert got == want


def test_matched_row_with_null_value_is_not_blended(spark):
    """The matched bar must be carried ATOMICALLY: per-column ignore-
    nulls carry would hand the probe the previous bar's volume under
    the matched bar's timestamp — a row that never existed."""
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    right = spark.createDataFrame(
        [("s", t(1), 100.0), ("s", t(2), None)],
        "sym string, bar_ts timestamp, volume double",
    )
    left = spark.createDataFrame([("s", t(3))], "sym string, ts timestamp")
    [row] = asof_join(
        left, right, ["sym"], "ts", "bar_ts", ["volume"]
    ).collect()
    assert row["asof_ts"] == t(2) and row["volume"] is None


def test_null_right_ts_never_matches(spark):
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    right = spark.createDataFrame(
        [("s", None, 7.0)], "sym string, bar_ts timestamp, volume double"
    )
    left = spark.createDataFrame([("s", t(1))], "sym string, ts timestamp")
    [row] = asof_join(
        left, right, ["sym"], "ts", "bar_ts", ["volume"]
    ).collect()
    assert row["asof_ts"] is None and row["volume"] is None


def test_left_payload_collision_raises(spark):
    import datetime as dt
    import pytest

    t = dt.datetime(2024, 1, 1)
    right = spark.createDataFrame(
        [("s", t, 1.0)], "sym string, bar_ts timestamp, volume double"
    )
    left = spark.createDataFrame(
        [("s", t, 2.0)], "sym string, ts timestamp, volume double"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["sym"], "ts", "bar_ts", ["volume"])


def test_asof_join_tolerance_nulls_stale_matches_atomically(spark):
    """merge_asof(tolerance=...) semantics: a matched bar older than
    the cap nulls out — asof_ts AND every value column together (the
    atomic-struct discipline); fresh matches and never-matched rows are
    unaffected."""
    from asset_prices_parquet_saver_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [("A", "2024-01-01 00:00:00", 10.0), ("A", "2024-01-10 00:00:00", 20.0)],
        "k string, bar_ts string, v double",
    ).selectExpr("k", "CAST(bar_ts AS TIMESTAMP) AS bar_ts", "v")
    left = spark.createDataFrame(
        [
            ("A", 1, "2024-01-02 00:00:00"),   # 1 day after bar 1 -> fresh
            ("A", 2, "2024-01-08 00:00:00"),   # 7 days after bar 1 -> stale
            ("A", 3, "2024-01-11 00:00:00"),   # 1 day after bar 2 -> fresh
            ("B", 4, "2024-01-05 00:00:00"),   # no bars at all -> NULL
        ],
        "k string, id long, ts string",
    ).selectExpr("k", "id", "CAST(ts AS TIMESTAMP) AS ts")
    out = {
        r["id"]: (r["asof_ts"], r["v"])
        for r in asof_join(
            left, right, keys=["k"], left_ts="ts", right_ts="bar_ts",
            value_cols=["v"], tolerance="2 days",
        ).collect()
    }
    assert out[1][1] == 10.0 and out[1][0] is not None
    assert out[2] == (None, None)          # stale: both columns null
    assert out[3][1] == 20.0
    assert out[4] == (None, None)          # never matched
    # without tolerance the stale probe matches bar 1
    base = {
        r["id"]: r["v"]
        for r in asof_join(
            left, right, keys=["k"], left_ts="ts", right_ts="bar_ts",
            value_cols=["v"],
        ).collect()
    }
    assert base[2] == 10.0
