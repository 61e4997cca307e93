"""Property-based checks (hypothesis): the funnel and drawdown window
compositions against straight-line Python references over arbitrary
event sets — the window-chaining trick in funnel_counts is subtle
enough to deserve adversarial inputs, not just fixtures."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from asset_prices_parquet_saver_spark.operators import analytics as an

STEPS = ["a", "b", "c"]

event_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),      # user_id
        st.integers(min_value=0, max_value=9),      # minute (duplicates likely)
        st.sampled_from(["a", "b", "c", "x"]),      # event_type
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=25,
)


def _mk(spark, rows):
    data = [
        (i, dt.datetime(2024, 1, 1, 0, m), u, t, float(v))
        for i, (u, m, t, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _funnel_ref(rows):
    """Per user, scan events in (ts, event_id) order carrying reached
    flags: step k qualifies iff step k-1 qualified strictly earlier."""
    by_user: dict[int, list[tuple]] = {}
    for i, (u, m, t, v) in enumerate(rows):
        by_user.setdefault(u, []).append((m, i, t))
    reached = {s: 0 for s in STEPS}
    for u, evs in by_user.items():
        evs.sort()
        done = [False] * len(STEPS)
        for _, _, t in evs:
            for k, s in enumerate(STEPS):
                if t == s and (k == 0 or done[k - 1]):
                    done[k] = True
                    break
        for k, s in enumerate(STEPS):
            if done[k]:
                reached[s] += 1
    return reached


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=event_strategy)
def test_funnel_matches_reference(spark, rows):
    out = {
        r["step_name"]: r["users"]
        for r in an.funnel_counts(_mk(spark, rows), STEPS).collect()
    }
    assert out == _funnel_ref(rows)


def _drawdown_ref(rows):
    by_user: dict[int, list[tuple]] = {}
    for i, (u, m, t, v) in enumerate(rows):
        by_user.setdefault(u, []).append((m, i, v))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        peak, dd = float("-inf"), 0.0
        for _, _, v in evs:
            peak = max(peak, v)
            dd = max(dd, peak - v)
        out[u] = (len(evs), round(peak, 6), round(dd, 6))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=event_strategy)
def test_drawdown_matches_reference(spark, rows):
    got = {
        r["user_id"]: (r["n_ticks"], r["peak_value"], r["max_drawdown"])
        for r in an.max_drawdown(_mk(spark, rows)).collect()
    }
    want = _drawdown_ref(rows)
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) <= 1.01e-6
        assert abs(got[u][2] - want[u][2]) <= 1.01e-6
