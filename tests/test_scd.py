"""SCD type-2 dimension maintenance (operators/scd.py).

The reference point-updates mutable attributes in place
(update_live_price.py:227 read-modify-write) — type 1. These tests pin
the type-2 semantics: run-collapse, version dating, incremental apply
≡ full rebuild, replay idempotence, and the as-of lookup.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.operators import scd


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def _changelog(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, obs_id long, attr string"
    )


BASE = [
    ("a", _ts(1), 1, "x"),
    ("a", _ts(2), 2, "x"),   # repeat observation — no new version
    ("a", _ts(3), 3, "y"),   # change
    ("a", _ts(4), 4, "y"),
    ("b", _ts(1), 5, "p"),
]


def _build(spark, rows):
    return scd.scd2_from_changelog(
        _changelog(spark, rows), "key", "ts", ["attr"], "obs_id"
    )


def test_run_collapse_and_dating(spark):
    out = {
        (r["key"], r["version"]): r
        for r in _build(spark, BASE).collect()
    }
    assert len(out) == 3  # a:x, a:y, b:p
    ax = out[("a", 1)]
    assert ax["attr"] == "x"
    assert ax["valid_from"] == _ts(1)
    assert ax["valid_to"] == _ts(3)  # closed by the change, not the repeat
    assert not ax["is_current"]
    ay = out[("a", 2)]
    assert ay["attr"] == "y" and ay["valid_to"] is None and ay["is_current"]
    bp = out[("b", 1)]
    assert bp["valid_to"] is None and bp["is_current"]


def test_null_attr_transition(spark):
    rows = [
        ("k", _ts(1), 1, "v"),
        ("k", _ts(2), 2, None),  # transition INTO null must open a version
        ("k", _ts(3), 3, None),  # repeat null — no new version
        ("k", _ts(4), 4, "v"),
    ]
    got = sorted(
        (r["version"], r["attr"]) for r in _build(spark, rows).collect()
    )
    assert got == [(1, "v"), (2, None), (3, "v")]


def test_same_ts_tiebreak(spark):
    rows = [
        ("k", _ts(1), 2, "late"),
        ("k", _ts(1), 1, "early"),
    ]
    got = {r["version"]: r["attr"] for r in _build(spark, rows).collect()}
    assert got == {1: "early", 2: "late"}


def _apply(dim, batch_df):
    return scd.scd2_apply(dim, batch_df, "key", "ts", ["attr"], "obs_id")


def _canon(df):
    return sorted(
        (r["key"], r["version"], r["attr"], r["valid_from"], r["valid_to"],
         r["is_current"])
        for r in df.collect()
    )


def test_incremental_apply_equals_full_rebuild(spark):
    batch1 = BASE
    batch2 = [
        ("a", _ts(5), 6, "z"),   # new attr for existing key
        ("b", _ts(2), 7, "p"),   # repeat — must not re-version b
        ("c", _ts(1), 8, "q"),   # brand-new key
    ]
    incremental = _apply(_build(spark, batch1), _changelog(spark, batch2))
    full = _build(spark, batch1 + batch2)
    assert _canon(incremental) == _canon(full)


def test_apply_replay_idempotent(spark):
    dim = _build(spark, BASE)
    once = _apply(dim, _changelog(spark, BASE))  # replay the whole log
    assert _canon(once) == _canon(dim)


def test_apply_late_insert_before_confirmation(spark):
    """hypothesis-found (round 5): a late observation landing between a
    version's opener and its last collapsed repeat must let the repeat
    RE-OPEN the attr — requires the dimension to retain the
    confirmation observation (last_observed), not just the opener."""
    first = [
        ("1", _ts(1), 100, "x"),
        ("1", _ts(1), 101, "x"),  # collapsed repeat
        ("1", _ts(2), 110, "x"),  # collapsed confirmation at day 2
    ]
    late = [("1", _ts(1), 111, "y")]  # lands between opener and confirm
    incremental = _apply(_build(spark, first), _changelog(spark, late))
    assert _canon(incremental) == _canon(_build(spark, first + late))
    got = {r["version"]: r["attr"] for r in incremental.collect()}
    assert got == {1: "x", 2: "y", 3: "x"}  # x resumes at day 2


def test_apply_late_data_reorders_versions(spark):
    dim = _build(spark, [("k", _ts(5), 2, "new")])
    late = _changelog(spark, [("k", _ts(1), 1, "old")])
    got = {r["version"]: (r["attr"], r["valid_to"]) for r in
           _apply(dim, late).collect()}
    assert got == {1: ("old", _ts(5)), 2: ("new", None)}


def test_asof_lookup(spark):
    dim = _build(spark, BASE)
    before_all = dt.datetime(2023, 12, 31, 5)
    facts = spark.createDataFrame(
        [("a", _ts(2, 12)), ("a", _ts(3)), ("b", _ts(1)), ("b", before_all)],
        "key string, ts timestamp",
    )
    out = scd.scd2_asof_lookup(facts, dim, "key", "ts")
    got = {(r["key"], r["ts"]): r["attr"] for r in out.collect()}
    assert got[("a", _ts(2, 12))] == "x"   # inside [d1, d3)
    assert got[("a", _ts(3))] == "y"       # boundary: new version wins
    assert got[("b", _ts(1))] == "p"
    assert got[("b", before_all)] is None  # before first version


def test_single_shuffle_plan(spark):
    """Both window passes must share ONE key-hash exchange — a second
    exchange would double the shuffle volume of every dimension build."""
    plan = _build(spark, BASE)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_apply_preserves_confirm_when_opener_tiebreak_null(spark):
    """A same-timestamp confirm whose OPENER has a NULL tiebreak must
    survive the fold-back: with plain !=, last_observed == valid_from
    makes the first disjunct false and (last_observed_by != NULL)
    makes the second NULL -> the whole filter NULL -> confirm dropped,
    so a late batch observation sorting between opener and confirm
    erases the history the confirm re-opens. Incremental apply must
    equal the one-shot full-log build (3 versions: x, y, x)."""
    base = [
        ("a", _ts(1), None, "x"),  # opener, NULL tiebreak (sorts first)
        ("a", _ts(1), 2, "x"),     # same-ts repeat confirms x
    ]
    late = [("a", _ts(1), 1, "y")]  # tiebreak 1: BETWEEN opener and confirm
    dim = _build(spark, base)
    applied = scd.scd2_apply(
        dim, _changelog(spark, late), "key", "ts", ["attr"], "obs_id"
    )
    full = _build(spark, base + late)
    a_cols = ["key", "version", "attr", "valid_from", "valid_to", "is_current"]
    got = sorted(
        tuple(r[c] for c in a_cols) for r in applied.collect()
    )
    want = sorted(tuple(r[c] for c in a_cols) for r in full.collect())
    assert got == want
    # the confirm re-opened x after the late y: 3 versions, x current
    assert len(got) == 3
    assert [v[2] for v in got] == ["x", "y", "x"]
