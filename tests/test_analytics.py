"""Semantic + plan tests for operators/analytics.py (funnel, cohort
retention, drawdown, profiling, histograms)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.operators import analytics as an


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_funnel_strict_ordering(spark):
    rows = [
        # u1: full ordered chain a -> b -> c
        (1, _t(1), 1, "a", 0.0),
        (2, _t(2), 1, "b", 0.0),
        (3, _t(3), 1, "c", 0.0),
        # u2: b before a — b never qualifies, c can't either
        (4, _t(1), 2, "b", 0.0),
        (5, _t(2), 2, "a", 0.0),
        (6, _t(3), 2, "c", 0.0),
        # u3: a then c (skips b) — only step 0 reached
        (7, _t(1), 3, "a", 0.0),
        (8, _t(2), 3, "c", 0.0),
        # u4: a, c, b, c — the SECOND c comes after a qualified b
        (9, _t(1), 4, "a", 0.0),
        (10, _t(2), 4, "c", 0.0),
        (11, _t(3), 4, "b", 0.0),
        (12, _t(4), 4, "c", 0.0),
    ]
    out = an.funnel_counts(_ev(spark, rows), ["a", "b", "c"])
    got = {r["step_name"]: r["users"] for r in out.collect()}
    assert got == {"a": 4, "b": 2, "c": 2}


def test_funnel_same_timestamp_not_counted(spark):
    # strictly-after semantics: a and b at the identical (ts, later id)
    # DOES count via id tie-break, but b before a's id does not.
    rows = [
        (1, _t(1), 1, "a", 0.0),
        (2, _t(1), 1, "b", 0.0),  # same ts, higher id → after a
        (4, _t(1), 2, "b", 0.0),  # same ts, lower id than a
        (5, _t(1), 2, "a", 0.0),
    ]
    out = an.funnel_counts(_ev(spark, rows), ["a", "b"])
    got = {r["step_name"]: r["users"] for r in out.collect()}
    assert got == {"a": 2, "b": 1}


def test_funnel_single_user_shuffle(spark):
    df = _ev(spark, [(1, _t(1), 1, "a", 0.0), (2, _t(2), 1, "b", 0.0)])
    out = an.funnel_counts(df, ["a", "b", "c"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one user-keyed exchange feeds both chained windows and the
    # per-user aggregate; only the final 1-row fold repartitions again
    assert plan.count("hashpartitioning(user_id") <= 1


def test_cohort_retention_grid(spark):
    d0 = dt.datetime(2024, 1, 1, 12)   # week of Jan 1 (Monday)
    d1 = dt.datetime(2024, 1, 9, 12)   # next week
    d2 = dt.datetime(2024, 1, 16, 12)  # +2 weeks
    rows = [
        (1, d0, 1, "x", 0.0),
        (2, d1, 1, "x", 0.0),   # u1 retained at offset 1
        (3, d0, 2, "x", 0.0),   # u2 only at offset 0
        (4, d1, 3, "x", 0.0),   # u3 cohort = week 2
        (5, d2, 3, "x", 0.0),   # retained at offset 1
    ]
    out = an.cohort_retention(_ev(spark, rows))
    got = {(str(r["cohort_week"]), r["week_offset"]): (r["users"], r["retention"]) for r in out.collect()}
    assert got[("2024-01-01", 0)] == (2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 0.5)
    assert got[("2024-01-08", 0)] == (1, 1.0)
    assert got[("2024-01-08", 1)] == (1, 1.0)


def test_max_drawdown_known_series(spark):
    rows = [
        (1, _t(1), 1, "x", 100.0),
        (2, _t(2), 1, "x", 80.0),   # dd 20
        (3, _t(3), 1, "x", 120.0),  # new peak
        (4, _t(4), 1, "x", 70.0),   # dd 50 ← max
        (5, _t(5), 1, "x", 110.0),
        (6, _t(1), 2, "x", 50.0),   # monotone up: dd 0
        (7, _t(2), 2, "x", 60.0),
    ]
    out = {r["user_id"]: r for r in an.max_drawdown(_ev(spark, rows)).collect()}
    assert out[1]["max_drawdown"] == 50.0 and out[1]["peak_value"] == 120.0
    assert out[2]["max_drawdown"] == 0.0 and out[2]["n_ticks"] == 2


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [(1.0, None), (2.0, 5.0), (2.0, 5.0)], "a double, b double"
    )
    got = {r["col_name"]: r for r in an.profile_columns(df, ["a", "b"]).collect()}
    assert got["a"]["n_nulls"] == 0 and got["a"]["n_distinct"] == 2
    assert got["a"]["min_val"] == 1.0 and got["a"]["max_val"] == 2.0
    assert got["b"]["n_nulls"] == 1 and got["b"]["n_distinct"] == 1


def test_fixed_histogram_clamps_and_counts(spark):
    df = spark.createDataFrame([(x,) for x in [-5.0, 0.0, 9.9, 10.0, 25.0, 99.0]], "v double")
    out = {r["bucket"]: r for r in an.fixed_histogram(df, "v", 0.0, 10.0, 5).collect()}
    assert out[0]["n"] == 3          # -5 clamped up, 0.0, 9.9
    assert out[1]["n"] == 1          # 10.0
    assert out[2]["n"] == 1          # 25.0
    assert out[4]["n"] == 1          # 99 clamped into the last bucket
    assert out[2]["bucket_lo"] == 20.0 and out[2]["bucket_hi"] == 30.0


def test_histogram_single_shuffle(spark, sf_dir):
    from asset_prices_parquet_saver_spark.sources.tables import read_table

    li = read_table(spark, sf_dir, "lineitem")
    out = an.fixed_histogram(li, "l_extendedprice", 0.0, 10000.0, 11)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # partial + final HashAggregate around one exchange — no pre-scan
    # for min/max (fixed bounds), so the histogram is a single pass
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1


def test_ohlc_bars_known_day(spark):
    rows = [
        (1, _t(1), 1, "x", 10.0),
        (2, _t(2), 1, "x", 30.0),
        (3, _t(3), 1, "x", 5.0),
        (4, _t(4), 1, "x", 20.0),
        # same-ts ticks: id tie-break decides open/close
        (5, _t(1), 2, "x", 7.0),
        (6, _t(1), 2, "x", 9.0),
    ]
    out = {r["user_id"]: r for r in an.ohlc_bars(_ev(spark, rows)).collect()}
    b = out[1]
    assert (b["open"], b["high"], b["low"], b["close"], b["n_ticks"]) == (10.0, 30.0, 5.0, 20.0, 4)
    b2 = out[2]
    assert (b2["open"], b2["close"]) == (7.0, 9.0)


def test_ohlc_plan_has_no_sort_or_window(spark, sf_dir):
    from asset_prices_parquet_saver_spark.sources.tables import read_table

    e = read_table(spark, sf_dir, "events")
    plan = an.ohlc_bars(e)._jdf.queryExecution().executedPlan().toString()
    # the struct-min/max formulation is a plain combinable aggregate —
    # no WindowExec, and the exchange sits ABOVE a partial aggregate,
    # so the shuffle carries per-(key, day) partials, never raw ticks
    # (struct min/max plans as SortAggregate: the sort is on the group
    # keys only, map-side, not a per-key ordering of the tick stream)
    assert "Window" not in plan
    assert "partial_min" in plan and "partial_max" in plan
    assert plan.index("Exchange") < plan.index("partial_min")


def test_twap_weights_by_duration(spark):
    # u1: price 10 held 60s, price 20 held 180s, last tick no weight
    rows = [
        (1, _t(0), 1, "x", 10.0),
        (2, _t(1), 1, "x", 20.0),
        (3, _t(4), 1, "x", 99.0),
    ]
    out = an.twap(_ev(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    want = (10.0 * 60 + 20.0 * 180) / 240
    assert r["twap"] == round(want, 6)
    assert r["span_micros"] == 240 * 1_000_000
    assert r["n_intervals"] == 2


def test_twap_drops_single_tick_days(spark):
    rows = [(1, _t(0), 1, "x", 10.0)]
    assert an.twap(_ev(spark, rows)).count() == 0


def test_dq_checks_counts_violations(spark):
    df = spark.createDataFrame(
        [(1.0, 0.1), (0.0, 0.5), (-2.0, 1.5), (None, None)], "q double, d double"
    )
    out = {
        r["check_name"]: r
        for r in an.dq_predicate_checks(
            df, {"q_pos": F.col("q") > 0, "d_range": F.col("d").between(0, 1)}
        ).collect()
    }
    # NULL predicate counts as a violation, same as SQL CASE ELSE
    assert out["q_pos"]["violations"] == 3 and out["q_pos"]["total"] == 4
    assert out["d_range"]["violations"] == 2
    assert not out["q_pos"]["passed"]


def test_dq_uniqueness_and_referential(spark):
    parent = spark.createDataFrame([(1,), (2,)], "k long")
    child = spark.createDataFrame([(1,), (1,), (3,)], "fk long")
    u = an.dq_uniqueness(child, ["fk"], "fk_unique").collect()[0]
    assert u["violations"] == 1 and not u["passed"]
    r = an.dq_referential(child, parent, "fk", "k", "child_has_parent").collect()[0]
    assert r["violations"] == 1 and r["total"] == 3 and not r["passed"]


def test_gap_fill_forward_fills_missing_days(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 1, "x", 10.0),
        (2, dt.datetime(2024, 1, 1, 12), 1, "x", 11.0),  # close of day 1
        (3, dt.datetime(2024, 1, 4, 9), 1, "x", 20.0),   # 2 gap days
    ]
    out = {str(r["day"]): r for r in an.gap_fill_daily(_ev(spark, rows)).collect()}
    assert len(out) == 4
    assert out["2024-01-01"]["close_filled"] == 11.0 and not out["2024-01-01"]["is_gap"]
    assert out["2024-01-02"]["close_filled"] == 11.0 and out["2024-01-02"]["is_gap"]
    assert out["2024-01-03"]["close_filled"] == 11.0 and out["2024-01-03"]["is_gap"]
    assert out["2024-01-04"]["close_filled"] == 20.0 and not out["2024-01-04"]["is_gap"]


def test_gap_fill_spans_are_per_key(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "x", 1.0),
        (2, dt.datetime(2024, 1, 3), 1, "x", 2.0),
        (3, dt.datetime(2024, 2, 10), 2, "x", 5.0),  # disjoint span
    ]
    out = an.gap_fill_daily(_ev(spark, rows))
    per_key = {r[0]: r[1] for r in out.groupBy("user_id").count().collect()}
    assert per_key == {1: 3, 2: 1}


def test_daily_returns_close_to_close(spark):
    rows = [
        # day 1: close = 10 (last tick by ts)
        (1, dt.datetime(2024, 1, 1, 9), 1, "x", 8.0),
        (2, dt.datetime(2024, 1, 1, 16), 1, "x", 10.0),
        # day 2: close = 12 -> ret = 0.2
        (3, dt.datetime(2024, 1, 2, 16), 1, "x", 12.0),
        # day 3: close = 9 -> ret = -0.25
        (4, dt.datetime(2024, 1, 3, 16), 1, "x", 9.0),
    ]
    out = {r["day"].day: r for r in an.daily_returns(_ev(spark, rows)).collect()}
    assert out[1]["ret"] is None and out[1]["prev_close"] is None
    assert out[2]["prev_close"] == 10.0 and out[2]["ret"] == 0.2
    assert out[3]["ret"] == -0.25


def test_daily_returns_zero_close_guard(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 16), 1, "x", 0.0),
        (2, dt.datetime(2024, 1, 2, 16), 1, "x", 5.0),
    ]
    out = sorted(an.daily_returns(_ev(spark, rows)).collect(), key=lambda r: r["day"])
    # division by a zero previous close yields NULL, not inf
    assert out[1]["prev_close"] == 0.0 and out[1]["ret"] is None


def test_dq_checks_pass_on_empty_input(spark):
    """An empty table violates nothing: violations=0 / passed=true,
    never NULL (SUM over zero rows) — a NULL gate neither passes nor
    fails, which silently reads as success downstream."""
    e = _ev(spark, [])
    rep = an.dq_predicate_checks(e, {"value_nonneg": F.col("value") >= 0})
    [r] = rep.collect()
    assert r["violations"] == 0 and r["total"] == 0 and r["passed"] is True


def test_dq_uniqueness_null_keys_not_false_violations(spark):
    """COUNT(DISTINCT a) skips NULLs; the struct form must not count N
    distinct NULL-keyed rows as N duplicates — but two IDENTICAL
    NULL-keyed tuples are still a real duplicate."""
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (None, "z"), (None, "w")], "k long, v string"
    )
    [r] = an.dq_uniqueness(df, ["k", "v"], "key").collect()
    assert r["violations"] == 0 and r["passed"] is True
    dup = spark.createDataFrame(
        [(None, "z"), (None, "z")], "k long, v string"
    )
    [r2] = an.dq_uniqueness(dup, ["k", "v"], "key").collect()
    assert r2["violations"] == 1 and r2["passed"] is False


def test_dq_referential_null_fk_vacuously_satisfies(spark):
    """SQL FK semantics: a NULL foreign key is not an orphan; the
    anti-join alone would keep it (NULL never equi-matches)."""
    child = spark.createDataFrame([(1,), (None,), (99,)], "fk long")
    parent = spark.createDataFrame([(1,)], "pk long")
    [r] = an.dq_referential(child, parent, "fk", "pk", "ref").collect()
    assert r["violations"] == 1  # only the real orphan (99)
    assert r["total"] == 3


def test_fixed_histogram_excludes_nulls(spark):
    df = spark.createDataFrame([(1.0,), (None,), (25.0,)], "v double")
    rows = an.fixed_histogram(df, "v", lo=0.0, width=10.0, n_buckets=3).collect()
    assert all(r["bucket"] is not None for r in rows)
    assert sum(r["n"] for r in rows) == 2


def test_funnel_empty_events_reports_zero_users(spark):
    out = an.funnel_counts(_ev(spark, []), ["a", "b"])
    got = {r["step_name"]: r["users"] for r in out.collect()}
    assert got == {"a": 0, "b": 0}


def test_weighted_mean_null_groups_match_sql_semantics(spark):
    """All-NULL value groups and zero/NULL weight totals must yield
    NULL like SUM(v*w)/SUM(w) — a bare skipna sum returned 0.0, a wrong
    answer that LOOKS like a real mean."""
    from asset_prices_parquet_saver_spark.functions.pandas_ops import (
        weighted_mean_per_group,
    )

    df = spark.createDataFrame(
        [
            ("all_null", None, 1.0), ("all_null", None, 2.0),
            ("zero_w", 5.0, 0.0), ("zero_w", 7.0, 0.0),
            ("ok", 2.0, 1.0), ("ok", 4.0, 3.0),
        ],
        "g string, v double, w double",
    )
    got = {r["g"]: r["wmean"] for r in weighted_mean_per_group(df, "g", "v", "w").collect()}
    assert got["all_null"] is None
    assert got["zero_w"] is None
    assert abs(got["ok"] - 3.5) < 1e-9  # (2*1 + 4*3) / 4


def test_zscore_preserves_input_column_types(spark):
    from asset_prices_parquet_saver_spark.functions.pandas_ops import zscore_per_group

    df = spark.createDataFrame(
        [(1, 10, 1.0), (2, 10, 3.0), (3, 20, 5.0)],
        "rid int, grp int, v double",
    )
    out = zscore_per_group(df, "grp", "v", "rid")
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types["rid"] == "int" and types["grp"] == "int"
    assert out.count() == 3


def _day(d: int) -> dt.datetime:
    return dt.datetime(2024, 1, d, 12, 0)


def test_bollinger_bands_known_series(spark):
    # one tick per day => close == value; closes 1..6 over 6 days
    rows = [(d, _day(d), 1, "x", float(d)) for d in range(1, 7)]
    out = {r["day"].day: r for r in an.bollinger_bands(_ev(spark, rows)).collect()}
    # full 5-row windows exist only for days 5 and 6
    assert sorted(out) == [5, 6]
    b5 = out[5]  # closes 1..5: mean 3, sample sd = sqrt(2.5)
    sd = 2.5 ** 0.5
    assert b5["ma"] == 3.0
    assert b5["upper_band"] == round(3 + 2 * sd, 6)
    assert b5["lower_band"] == round(3 - 2 * sd, 6)
    assert out[6]["ma"] == 4.0


def test_rsi_known_gains_losses(spark):
    # 15 closes => 14 diffs: 8 gains of +1 then 6 losses of -1
    closes = [10.0]
    for i in range(8):
        closes.append(closes[-1] + 1)
    for i in range(6):
        closes.append(closes[-1] - 1)
    rows = [(d + 1, _day(d + 1), 1, "x", c) for d, c in enumerate(closes)]
    out = an.rsi(_ev(spark, rows)).collect()
    assert len(out) == 1  # only one full 14-move window
    assert out[0]["rsi"] == round(100 * 8 / 14, 6)
    # strictly-rising series: RSI pegs at exactly 100
    rows_up = [(d, _day(d), 2, "x", 10.0 + d) for d in range(1, 16)]
    up = an.rsi(_ev(spark, rows_up)).collect()
    assert [r["rsi"] for r in up] == [100.0]
    # flat series: no gains, no losses -> RSI undefined (NULL)
    rows_flat = [(d, _day(d), 3, "x", 10.0) for d in range(1, 16)]
    flat = an.rsi(_ev(spark, rows_flat)).collect()
    assert [r["rsi"] for r in flat] == [None]


def test_beta_vs_market_known_slopes(spark):
    rows = [
        # A: +10% both days (constant return => zero covariance => beta 0)
        (1, _day(1), 1, "x", 100.0),
        (2, _day(2), 1, "x", 110.0),
        (3, _day(3), 1, "x", 121.0),
        # B: -10% then +10% (moves 2x the market) => beta 2
        (4, _day(1), 2, "x", 100.0),
        (5, _day(2), 2, "x", 90.0),
        (6, _day(3), 2, "x", 99.0),
        # C: single return, on days where no one else trades => below
        # min_days => NULL beta (and no effect on A/B's market mean)
        (7, _day(10), 3, "x", 50.0),
        (8, _day(11), 3, "x", 55.0),
    ]
    out = {r["user_id"]: r for r in an.beta_vs_market(_ev(spark, rows)).collect()}
    assert out[1]["beta"] == 0.0
    assert out[2]["beta"] == 2.0
    assert out[3]["beta"] is None and out[3]["n_days"] == 1


def test_beta_market_side_broadcasts(spark, sf_dir):
    from asset_prices_parquet_saver_spark.sources.tables import read_table

    e = read_table(spark, sf_dir, "events")
    plan = an.beta_vs_market(e)._jdf.queryExecution().executedPlan().toString()
    # the |days|-row market series must broadcast back onto the
    # returns — a shuffled join here would move the tick-derived
    # return table twice at 100 TB
    assert "BroadcastHashJoin" in plan


def test_ewma_matches_pandas_adjust_false(spark):
    """ewma_closes must reproduce pandas ewm(adjust=False).mean() over
    each key's daily-close series (one close per day here, so the
    rollup is the identity)."""
    import pandas as pd

    rows = []
    prices = {1: [10.0, 12.0, 11.0, 15.0, 14.5], 2: [100.0, 90.0, 95.0]}
    eid = 0
    for uid, ps in prices.items():
        for d, p in enumerate(ps):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1 + d, 12), uid, "x", p))
    out = an.ewma_closes(_ev(spark, rows), alpha=0.2)
    got = {
        (r["user_id"], r["day"].day): r["ewma"] for r in out.collect()
    }
    for uid, ps in prices.items():
        exp = pd.Series(ps).ewm(alpha=0.2, adjust=False).mean()
        for d, e in enumerate(exp):
            assert abs(got[(uid, 1 + d)] - round(e, 6)) < 1e-9, (uid, d)


def test_ewma_respects_key_column_type(spark):
    """The applyInPandas out-schema derives the key field's type from
    the input — a string-keyed frame must round-trip, not corrupt."""
    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1), "AAPL", "x", 10.0),
            (2, dt.datetime(2024, 1, 2), "AAPL", "x", 20.0),
            (3, dt.datetime(2024, 1, 1), "MSFT", "x", 5.0),
        ],
        "event_id long, ts timestamp, sym string, event_type string, value double",
    )
    out = an.ewma_closes(df, alpha=0.2, key_col="sym")
    assert dict(out.dtypes)["sym"] == "string"
    got = {(r["sym"], r["day"].day): r["ewma"] for r in out.collect()}
    assert got[("AAPL", 1)] == 10.0
    assert abs(got[("AAPL", 2)] - 12.0) < 1e-9  # 0.2*20 + 0.8*10
    assert got[("MSFT", 1)] == 5.0


def test_macd_matches_pandas_adjust_false(spark):
    """macd must reproduce the pandas ewm(adjust=False) composition:
    EMA12 − EMA26, EMA9 signal over the macd series, histogram."""
    import pandas as pd

    prices = [10.0, 12.0, 11.0, 15.0, 14.5, 13.0, 16.0, 17.5]
    rows = [
        (i + 1, dt.datetime(2024, 1, 1 + i, 12), 1, "x", p)
        for i, p in enumerate(prices)
    ]
    out = an.macd(_ev(spark, rows))
    got = {r["day"].day: (r["macd"], r["signal"], r["histogram"]) for r in out.collect()}
    s = pd.Series(prices)
    ema = lambda n, x: x.ewm(span=n, adjust=False).mean()
    m = ema(12, s) - ema(26, s)
    sig = ema(9, m)
    for i in range(len(prices)):
        em, es, eh = round(m[i], 6), round(sig[i], 6), round(m[i] - sig[i], 6)
        gm, gs, gh = got[1 + i]
        assert abs(gm - em) < 1e-9 and abs(gs - es) < 1e-9 and abs(gh - eh) < 1e-9, i


def test_sharpe_ratio_known_series(spark):
    import math

    rows = [
        # A: returns 0.1 then 0.2 -> mean .15, sample sd sqrt(.005)
        (1, _day(1), 1, "x", 100.0),
        (2, _day(2), 1, "x", 110.0),
        (3, _day(3), 1, "x", 132.0),
        # B: constant +10% -> zero variance -> NULL sharpe
        (4, _day(1), 2, "x", 100.0),
        (5, _day(2), 2, "x", 110.0),
        (6, _day(3), 2, "x", 121.0),
        # C: one return only -> below min_days -> NULL
        (7, _day(1), 3, "x", 50.0),
        (8, _day(2), 3, "x", 55.0),
    ]
    out = {r["user_id"]: r for r in an.sharpe_ratio(_ev(spark, rows)).collect()}
    exp = (0.3 / 2) / math.sqrt((2 * 0.05 - 0.3 * 0.3) / 2.0) * math.sqrt(252.0)
    assert abs(out[1]["sharpe"] - exp) < 1e-6 and out[1]["n_days"] == 2
    assert out[2]["sharpe"] is None and out[2]["n_days"] == 2
    assert out[3]["sharpe"] is None and out[3]["n_days"] == 1


def test_return_correlations_signs_and_bound(spark):
    rows = [
        # A and B: perfectly positively correlated returns
        (1, _day(1), 1, "x", 100.0),
        (2, _day(2), 1, "x", 110.0),
        (3, _day(3), 1, "x", 132.0),
        (4, _day(1), 2, "x", 50.0),
        (5, _day(2), 2, "x", 60.0),
        (6, _day(3), 2, "x", 84.0),
        # C: perfectly anti-correlated with A, but only 2 common days
        (7, _day(1), 3, "x", 100.0),
        (8, _day(2), 3, "x", 90.0),
        (9, _day(3), 3, "x", 72.0),
    ]
    out = {
        (r["key_a"], r["key_b"]): r
        for r in an.return_correlations(_ev(spark, rows), top_k=3).collect()
    }
    assert out[(1, 2)]["corr"] == 1.0
    assert out[(1, 3)]["corr"] == -1.0
    assert out[(2, 3)]["corr"] == -1.0
    assert all(r["n_days"] == 2 for r in out.values())

    # top_k bounds the universe: with top_k=2 only the two
    # most-observed keys pair up (count tie -> key-asc tie-break)
    bounded = an.return_correlations(_ev(spark, rows), top_k=2).collect()
    assert [(r["key_a"], r["key_b"]) for r in bounded] == [(1, 2)]


def test_return_correlations_zero_variance_is_null(spark):
    rows = [
        # A: constant +10% -> zero variance
        (1, _day(1), 1, "x", 100.0),
        (2, _day(2), 1, "x", 110.0),
        (3, _day(3), 1, "x", 121.0),
        # B: varying returns
        (4, _day(1), 2, "x", 100.0),
        (5, _day(2), 2, "x", 110.0),
        (6, _day(3), 2, "x", 132.0),
    ]
    out = an.return_correlations(_ev(spark, rows), top_k=2).collect()
    assert len(out) == 1
    assert out[0]["corr"] is None and out[0]["n_days"] == 2


def test_atr_known_series(spark):
    # one tick/day => high == low == close => TR_1 = 0, TR_t = |Δclose|
    closes = [10.0, 12.0, 11.0, 15.0]
    rows = [(d, _day(d), 1, "x", c) for d, c in enumerate(closes, start=1)]
    out = {r["day"].day: r for r in an.atr(_ev(spark, rows), window=3).collect()}
    assert sorted(out) == [3, 4]  # full 3-day windows only
    assert out[3]["true_range"] == 1.0
    assert abs(out[3]["atr"] - (0 + 2 + 1) / 3) < 1e-6
    assert out[4]["true_range"] == 4.0
    assert abs(out[4]["atr"] - (2 + 1 + 4) / 3) < 1e-6


def test_atr_gap_uses_prev_close(spark):
    # day2 gaps ABOVE day1's close: TR = |high - prev_close|, not h-l
    rows = [
        (1, _day(1), 1, "x", 10.0),
        # day2: intraday range 20..21, prev close 10 => TR = 21-10 = 11
        (2, dt.datetime(2024, 1, 2, 10), 1, "x", 20.0),
        (3, dt.datetime(2024, 1, 2, 11), 1, "x", 21.0),
    ]
    out = {r["day"].day: r for r in an.atr(_ev(spark, rows), window=2).collect()}
    assert out[2]["true_range"] == 11.0
    assert abs(out[2]["atr"] - (0 + 11) / 2) < 1e-9


def test_stochastic_known_series(spark):
    closes = [10.0, 20.0, 30.0, 25.0]
    rows = [(d, _day(d), 1, "x", c) for d, c in enumerate(closes, start=1)]
    out = {
        r["day"].day: r
        for r in an.stochastic_oscillator(
            _ev(spark, rows), k_window=3, d_window=2
        ).collect()
    }
    assert sorted(out) == [3, 4]
    assert out[3]["pct_k"] == 100.0
    assert out[3]["pct_d"] is None  # first %K row: no full %D window
    assert out[4]["pct_k"] == 50.0
    assert out[4]["pct_d"] == 75.0


def test_stochastic_flat_range_is_null(spark):
    rows = [(d, _day(d), 1, "x", 10.0) for d in range(1, 5)]
    out = an.stochastic_oscillator(_ev(spark, rows), k_window=3, d_window=2).collect()
    assert all(r["pct_k"] is None and r["pct_d"] is None for r in out)


def test_adjusted_closes_suffix_product(spark):
    rows = [
        (1, _day(1), 1, "x", 100.0),
        (2, _day(2), 1, "x", 102.0),
        (3, _day(3), 1, "x", 51.0),   # post-split price level
        (4, _day(4), 1, "x", 52.0),
        # key 2: no actions at all -> factor 1, adj == close
        (5, _day(1), 2, "x", 10.0),
    ]
    # 2:1 split effective day 3: back-multiplier 0.5 on days < 3
    acts = spark.createDataFrame(
        [(1, dt.date(2024, 1, 3), 0.5)], "user_id long, aday date, ratio double"
    )
    out = {
        (r["user_id"], r["day"].day): r
        for r in an.adjusted_closes(_ev(spark, rows), acts).collect()
    }
    assert out[(1, 1)]["adj_close"] == 50.0 and out[(1, 1)]["adj_factor"] == 0.5
    assert out[(1, 2)]["adj_close"] == 51.0
    # the action day itself and later days are NOT adjusted (strict >)
    assert out[(1, 3)]["adj_close"] == 51.0 and out[(1, 3)]["adj_factor"] == 1.0
    assert out[(1, 4)]["adj_close"] == 52.0
    assert out[(2, 1)]["adj_close"] == 10.0 and out[(2, 1)]["adj_factor"] == 1.0


def test_adjusted_closes_stacks_multiple_actions(spark):
    rows = [(d, _day(d), 1, "x", 100.0) for d in range(1, 5)]
    acts = spark.createDataFrame(
        [(1, dt.date(2024, 1, 2), 0.5), (1, dt.date(2024, 1, 4), 0.25)],
        "user_id long, aday date, ratio double",
    )
    out = {
        r["day"].day: r for r in an.adjusted_closes(_ev(spark, rows), acts).collect()
    }
    assert out[1]["adj_factor"] == 0.125  # both later actions stack
    assert out[2]["adj_factor"] == 0.25   # only the day-4 action
    assert out[3]["adj_factor"] == 0.25
    assert out[4]["adj_factor"] == 1.0


def test_ohlc_weekly_period(spark):
    # Mon Jan 1 2024 .. Mon Jan 8: two ISO weeks; open/close follow
    # (ts, id) order inside each week
    rows = [
        (1, dt.datetime(2024, 1, 1, 9), 1, "x", 10.0),
        (2, dt.datetime(2024, 1, 3, 9), 1, "x", 30.0),
        (3, dt.datetime(2024, 1, 7, 9), 1, "x", 5.0),   # Sunday, same week
        (4, dt.datetime(2024, 1, 8, 9), 1, "x", 7.0),   # next Monday
    ]
    out = {r["day"]: r for r in an.ohlc_bars(_ev(spark, rows), period="week").collect()}
    w1, w2 = dt.date(2024, 1, 1), dt.date(2024, 1, 8)
    assert sorted(out) == [w1, w2]
    b = out[w1]
    assert (b["open"], b["high"], b["low"], b["close"], b["n_ticks"]) == (
        10.0, 30.0, 5.0, 5.0, 3)
    assert out[w2]["open"] == 7.0 and out[w2]["n_ticks"] == 1


def test_returns_monthly_period(spark):
    rows = [
        # Jan: two ticks, close 110 (later ts wins); Feb: close 121
        (1, dt.datetime(2024, 1, 5, 9), 1, "x", 100.0),
        (2, dt.datetime(2024, 1, 20, 9), 1, "x", 110.0),
        (3, dt.datetime(2024, 2, 10, 9), 1, "x", 121.0),
    ]
    out = {
        r["day"]: r
        for r in an.daily_returns(_ev(spark, rows), period="month").collect()
    }
    jan, feb = dt.date(2024, 1, 1), dt.date(2024, 2, 1)
    assert sorted(out) == [jan, feb]
    assert out[jan]["close"] == 110.0 and out[jan]["ret"] is None
    assert out[feb]["prev_close"] == 110.0 and out[feb]["ret"] == 0.1


def test_obv_signed_cumulative(spark):
    # one key, 4 daily bars with volumes 2,1,3,1 and closes 10,12,12,9:
    # deltas 0, +1, 0 (flat), -1 -> obv 0, 1, 1, 0
    rows = [
        (1, dt.datetime(2024, 1, 1, 9), 1, "x", 8.0),
        (2, dt.datetime(2024, 1, 1, 10), 1, "x", 10.0),   # d1 close 10, vol 2
        (3, dt.datetime(2024, 1, 2, 9), 1, "x", 12.0),    # d2 close 12, vol 1
        (4, dt.datetime(2024, 1, 3, 9), 1, "x", 11.0),
        (5, dt.datetime(2024, 1, 3, 10), 1, "x", 13.0),
        (6, dt.datetime(2024, 1, 3, 11), 1, "x", 12.0),   # d3 close 12, vol 3
        (7, dt.datetime(2024, 1, 4, 9), 1, "x", 9.0),     # d4 close 9, vol 1
    ]
    out = {r["day"]: r for r in an.obv(_ev(spark, rows)).collect()}
    days = [dt.date(2024, 1, d) for d in (1, 2, 3, 4)]
    assert [out[d]["volume"] for d in days] == [2, 1, 3, 1]
    assert [out[d]["obv"] for d in days] == [0, 1, 1, 0]


def test_donchian_channels_window_and_breakouts(spark):
    # window=2 for a hand-checkable series: highs/lows per day are the
    # single tick; closes equal the tick. Day3 close 30 > max(high of
    # d1..d2)=20 -> breakout_up; day4 close 5 < min(low d2..d3)=15 ->
    # breakout_down.
    rows = [
        (1, dt.datetime(2024, 1, 1, 9), 1, "x", 10.0),
        (2, dt.datetime(2024, 1, 2, 9), 1, "x", 20.0),
        (3, dt.datetime(2024, 1, 3, 9), 1, "x", 30.0),
        (4, dt.datetime(2024, 1, 4, 9), 1, "x", 5.0),
    ]
    out = {
        r["day"]: r
        for r in an.donchian_channels(_ev(spark, rows), window=2).collect()
    }
    # full current window AND full previous window -> days 3, 4 only
    assert sorted(out) == [dt.date(2024, 1, 3), dt.date(2024, 1, 4)]
    d3 = out[dt.date(2024, 1, 3)]
    assert (d3["upper"], d3["lower"], d3["middle"]) == (30.0, 20.0, 25.0)
    assert d3["breakout_up"] is True and d3["breakout_down"] is False
    d4 = out[dt.date(2024, 1, 4)]
    assert (d4["upper"], d4["lower"]) == (30.0, 5.0)
    assert d4["breakout_down"] is True and d4["breakout_up"] is False


def test_leakage_free_split_no_user_spans_two_splits(spark, sf_dir):
    """The structural property the grouped split exists for: assigning
    by user_id means no user ever appears in two splits — checked
    directly on the per-event assignment."""
    from pyspark.sql import functions as F

    from asset_prices_parquet_saver_spark.operators import sampling
    from asset_prices_parquet_saver_spark.sources.tables import read_table

    e = read_table(spark, sf_dir, "events")
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    labeled = e.select(
        "user_id", sampling.assign_split(F.col("user_id"), splits).alias("split")
    )
    spanning = (
        labeled.groupBy("user_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert spanning == 0
    # and every split is non-empty at this sf
    assert labeled.select("split").distinct().count() == 3


def test_user_growth_first_seen_and_cumulative(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 9), 1, "x", 1.0),   # u1 first d1
        (2, dt.datetime(2024, 1, 3, 9), 1, "x", 1.0),   # u1 again (ignored)
        (3, dt.datetime(2024, 1, 1, 10), 2, "x", 1.0),  # u2 first d1
        (4, dt.datetime(2024, 1, 2, 9), 3, "x", 1.0),   # u3 first d2
        (5, dt.datetime(2024, 1, 4, 9), 4, "x", 1.0),   # u4 first d4
    ]
    out = {
        r["period_start"]: r
        for r in an.user_growth(_ev(spark, rows), period="day").collect()
    }
    d = lambda day: dt.datetime(2024, 1, day)
    assert sorted(out) == [d(1), d(2), d(4)]
    assert [(out[k]["new_users"], out[k]["cumulative_users"])
            for k in sorted(out)] == [(2, 2), (1, 3), (1, 4)]


def test_keltner_composes_ewma_and_atr(spark, sf_dir):
    """Keltner = EMA(20) ± 2·ATR(10): middle equals the ewma kernel's
    output, band width equals 4·atr exactly (arithmetic on rounded
    components), rows = full-ATR-window days only."""
    from asset_prices_parquet_saver_spark.sources.tables import read_table

    e = read_table(spark, sf_dir, "events")
    kc = {(r["user_id"], r["day"]): r
          for r in an.keltner_channels(e, 20, 10, 2.0).limit(500).collect()}
    assert kc
    ew = {(r["user_id"], r["day"]): r["ewma"]
          for r in an.ewma_closes(e, alpha=2.0 / 21.0).collect()}
    at = {(r["user_id"], r["day"]): r["atr"]
          for r in an.atr(e, window=10).collect()}
    for k, r in kc.items():
        assert r["middle"] == ew[k]
        assert r["upper"] == ew[k] + 2.0 * at[k]
        assert r["lower"] == ew[k] - 2.0 * at[k]
        assert r["lower"] <= r["middle"] <= r["upper"]


# ------------------------- market-basket association rules (pair Apriori)

def test_basket_rules_support_confidence_lift(spark):
    from asset_prices_parquet_saver_spark.operators import analytics as an

    # 4 baskets: {x,y} {x,y} {x,z} {y}
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"), (4, "y")]
    df = spark.createDataFrame(rows, ["o", "it"])
    out = {
        (r.antecedent, r.consequent): (r.co_count, r.support, r.confidence, r.lift)
        for r in an.basket_rules(df, "o", "it", min_support=0.0).collect()
    }
    # x&y co-occur twice: support 0.5, conf x->y = 2/3, y->x = 2/3,
    # lift = 2*4/(3*3)
    assert out[("x", "y")] == (2, 0.5, round(2 / 3, 6), round(8 / 9, 6))
    assert out[("y", "x")] == (2, 0.5, round(2 / 3, 6), round(8 / 9, 6))
    # x&z co-occur once: conf z->x = 1.0, lift = 1*4/(3*1)
    assert out[("z", "x")] == (1, 0.25, 1.0, round(4 / 3, 6))
    # duplicate (basket, item) rows must not inflate counts
    df_dup = spark.createDataFrame(rows + [(1, "x")], ["o", "it"])
    out2 = an.basket_rules(df_dup, "o", "it", min_support=0.0)
    assert {(r.antecedent, r.consequent, r.co_count) for r in out2.collect()} == {
        (a, c, v[0]) for (a, c), v in out.items()
    }


def test_basket_rules_min_support_cut(spark):
    from asset_prices_parquet_saver_spark.operators import analytics as an

    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z")]
    df = spark.createDataFrame(rows, ["o", "it"])
    out = an.basket_rules(df, "o", "it", min_support=0.5)
    kept = {(r.antecedent, r.consequent) for r in out.collect()}
    assert kept == {("x", "y"), ("y", "x")}  # x&z support 1/3 < 0.5
