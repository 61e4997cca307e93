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


def _round6p(x: float) -> float:
    """Python replica of the IEEE-floor rounding contract."""
    import math

    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


tick_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),           # user_id
        st.integers(min_value=1, max_value=8),           # day
        st.integers(min_value=0, max_value=23),          # hour
        st.integers(min_value=1, max_value=50000),       # price in cents
    ),
    min_size=2,
    max_size=40,
)


def _mk_days(spark, rows):
    data = [
        (i, dt.datetime(2024, 1, d, h), u, "x", c / 100.0)
        for i, (u, d, h, c) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _returns_ref(rows):
    """Per user: daily close = last (ts, event_id) tick of the day;
    simple returns, IEEE-floor rounded to 6 dp (skipping zero closes)."""
    closes: dict[tuple, tuple] = {}
    for i, (u, d, h, c) in enumerate(rows):
        key = (u, d)
        cand = (h, i, c / 100.0)
        if key not in closes or cand > closes[key]:
            closes[key] = cand
    rets: dict[int, list[float]] = {}
    for u in sorted({k[0] for k in closes}):
        days = sorted(d for (uu, d) in closes if uu == u)
        for prev, cur in zip(days, days[1:]):
            p, c = closes[(u, prev)][2], closes[(u, cur)][2]
            if p != 0:
                rets.setdefault(u, []).append(_round6p(c / p - 1))
    return rets


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(tick_strategy)
def test_sharpe_matches_reference(spark, rows):
    import math

    out = {r["user_id"]: r for r in an.sharpe_ratio(_mk_days(spark, rows)).collect()}
    rets = _returns_ref(rows)
    for u, r in out.items():
        rs = rets.get(u, [])
        assert r["n_days"] == len(rs)
        n = len(rs)
        if n < 2:
            assert r["sharpe"] is None
            continue
        sx, sxx = sum(rs), sum(x * x for x in rs)
        var_num = n * sxx - sx * sx
        if var_num <= 0:
            assert r["sharpe"] is None
            continue
        exp = (sx / n) / math.sqrt(var_num / (n * (n - 1.0))) * math.sqrt(252.0)
        assert abs(r["sharpe"] - exp) < 1e-5, (u, rs)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(tick_strategy)
def test_return_correlations_match_reference(spark, rows):
    import math

    out = {
        (r["key_a"], r["key_b"]): r
        for r in an.return_correlations(_mk_days(spark, rows), top_k=3).collect()
    }
    # reference: returns per (user, day), pair-aligned on common days
    closes: dict[tuple, tuple] = {}
    for i, (u, d, h, c) in enumerate(rows):
        key = (u, d)
        cand = (h, i, c / 100.0)
        if key not in closes or cand > closes[key]:
            closes[key] = cand
    byday: dict[int, dict[int, float]] = {}
    for u in {k[0] for k in closes}:
        days = sorted(d for (uu, d) in closes if uu == u)
        for prev, cur in zip(days, days[1:]):
            p, c = closes[(u, prev)][2], closes[(u, cur)][2]
            if p != 0:
                byday.setdefault(u, {})[cur] = _round6p(c / p - 1)
    users = sorted(byday)
    expected_pairs = set()
    for i, a in enumerate(users):
        for b in users[i + 1 :]:
            common = sorted(set(byday[a]) & set(byday[b]))
            if not common:
                continue
            expected_pairs.add((a, b))
            xs = [byday[a][d] for d in common]
            ys = [byday[b][d] for d in common]
            r = out[(a, b)]
            n = len(common)
            assert r["n_days"] == n
            sx, sy = sum(xs), sum(ys)
            sxy = sum(x * y for x, y in zip(xs, ys))
            sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
            vx, vy = n * sxx - sx * sx, n * syy - sy * sy
            if n < 2 or vx <= 0 or vy <= 0:
                assert r["corr"] is None
            else:
                exp = (n * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy))
                assert abs(r["corr"] - exp) < 1e-5
    assert set(out) == expected_pairs


def test_contrastive_negatives_deterministic_and_self_free(spark):
    from asset_prices_parquet_saver_spark.operators import sampling

    df = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
    out1 = sorted(
        (r.anchor_id, r.neg_rank, r.neg_id)
        for r in sampling.contrastive_negatives(df, "doc_id", k=3).collect()
    )
    out2 = sorted(
        (r.anchor_id, r.neg_rank, r.neg_id)
        for r in sampling.contrastive_negatives(
            df.repartition(7), "doc_id", k=3
        ).collect()
    )
    assert out1 == out2  # partition-invariant
    assert all(a != n for a, _, n in out1)  # no self-negatives
    assert len(out1) >= 50 * 3 - 10  # only rare self-hits dropped
    per_anchor = {}
    for a, j, _ in out1:
        per_anchor.setdefault(a, []).append(j)
    assert all(len(js) <= 3 for js in per_anchor.values())


def test_basket_rules_match_python_reference(spark):
    import random
    from itertools import combinations

    from asset_prices_parquet_saver_spark.operators import analytics as an

    rng = random.Random(13)
    items = [f"i{k}" for k in range(6)]
    baskets = {
        b: set(rng.sample(items, rng.randint(1, 4))) for b in range(40)
    }
    rows = [(b, it) for b, s in baskets.items() for it in s]
    df = spark.createDataFrame(rows, ["o", "it"])

    n = len(baskets)
    cnt = {it: sum(it in s for s in baskets.values()) for it in items}
    want = {}
    for a, b in combinations(sorted(items), 2):
        co = sum(a in s and b in s for s in baskets.values())
        if co and round(co / n, 6) >= 0.05:
            for ante, cons in ((a, b), (b, a)):
                want[(ante, cons)] = (
                    co,
                    round(co / n, 6),
                    round(co / cnt[ante], 6),
                    round(co * n / (cnt[ante] * cnt[cons]), 6),
                )
    got = {
        (r.antecedent, r.consequent): (
            r.co_count, r.support, r.confidence, r.lift
        )
        for r in an.basket_rules(df, "o", "it", min_support=0.05).collect()
    }
    assert got == want and want


def test_triangle_counts_match_python_reference(spark):
    import random
    from itertools import combinations

    from asset_prices_parquet_saver_spark.operators import graph

    rng = random.Random(29)
    verts = list(range(12))
    edges = {e for e in combinations(verts, 2) if rng.random() < 0.4}
    df = spark.createDataFrame(
        [(a, b) if rng.random() < 0.5 else (b, a) for a, b in edges],
        ["src", "dst"],
    )
    want: dict[int, int] = {}
    for a, b, c in combinations(verts, 3):
        if {(a, b), (b, c), (a, c)} <= edges:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    got = {r.vertex: r.n_triangles for r in graph.triangle_counts(df).collect()}
    assert got == want and want
