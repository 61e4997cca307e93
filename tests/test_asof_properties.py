"""Property-based as-of join check (hypothesis): the one-shuffle
tagged-union + struct-carry formulation must equal a straight-line
Python brute force — latest right row with right_ts <= left_ts per
key, ties inclusive, NULL value fields carried from the MATCHED row
(not blended from an earlier one), NULL right_ts never matching.

The struct-carry rewrite (operators/asof.py) exists precisely because
the per-column form blended rows on NULL fields; adversarial inputs
(ties, NULL values, NULL timestamps, probes before any bar) keep it
honest beyond the fixtures."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from asset_prices_parquet_saver_spark.operators.asof import asof_join


def _t(off: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=off)


# right side: (key, ts offset or None, value or None) — unique (key, ts)
right_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),
        st.one_of(st.none(), st.integers(min_value=0, max_value=6)),
        st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
    ),
    min_size=0,
    max_size=8,
    unique_by=lambda r: (r[0], r[1]),
)

left_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),
        st.integers(min_value=0, max_value=6),
    ),
    min_size=1,
    max_size=6,
)


def _brute(left, right):
    out = []
    for i, (k, lo) in enumerate(left):
        best = None
        for rk, ro, rv in right:
            if rk != k or ro is None or ro > lo:
                continue
            if best is None or ro > best[0]:
                best = (ro, rv)
        out.append((i, k, lo, best))
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(left=left_strategy, right=right_strategy)
def test_asof_join_matches_brute_force(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, _t(o)) for i, (k, o) in enumerate(left)],
        "probe_id long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, _t(o) if o is not None else None,
          float(v) if v is not None else None)
         for k, o, v in right],
        "k long, bar_ts timestamp, val double",
    )
    got = sorted(
        (
            r["probe_id"],
            r["k"],
            (r["ts"] - dt.datetime(2024, 1, 1)) // dt.timedelta(hours=1),
            None
            if r["asof_ts"] is None
            else (
                (r["asof_ts"] - dt.datetime(2024, 1, 1)) // dt.timedelta(hours=1),
                None if r["val"] is None else int(r["val"]),
            ),
        )
        for r in asof_join(ldf, rdf, ["k"], "ts", "bar_ts", ["val"]).collect()
    )
    assert got == _brute(left, right)
