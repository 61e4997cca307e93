"""Incremental materialized-view maintenance (sources/matview.py).

Invariant under test: refresh-then-read is EXACTLY recompute-from-
scratch — after any append sequence (incremental path) and after any
rewrite (full-recompute fallback) — including NULL group keys, all-NULL
sum groups, and float-order-sensitive AVG (exact decimal partials).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.sources import manifest as mf
from asset_prices_parquet_saver_spark.sources import matview as mv
from asset_prices_parquet_saver_spark.sources.tables import read_table

AGGS = [
    ["n", "count", None],
    ["n_vals", "count_col", "value"],
    ["total", "sum", "value"],
    ["lo", "min", "value"],
    ["hi", "max", "value"],
    ["mean", "avg", "value"],
]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k STRING, value DOUBLE")


def _expected(spark, base_table):
    df = mf.read_versioned(spark, base_table)
    return {
        tuple(r)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("value").alias("n_vals"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            (
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
                / F.count("value")
            ).alias("mean"),
        )
        .collect()
    }


def _read(spark, mv_table):
    return {tuple(r) for r in mv.read_mv(spark, mv_table).collect()}


def test_mv_create_matches_direct(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "mv")
    mf.commit_versioned(
        _mk(spark, [("a", 1.0), ("a", 2.0), ("b", None), (None, 5.0)]), base
    )
    mv.create_mv(spark, view, base, ["k"], AGGS)
    assert _read(spark, view) == _expected(spark, base)
    # all-NULL group keeps NULL sum/min/max/avg, n=1, n_vals=0
    rows = {r.k: r for r in mv.read_mv(spark, view).collect()}
    assert rows["b"].total is None and rows["b"].n == 1
    assert rows["b"].n_vals == 0 and rows["b"].mean is None
    assert None in rows  # NULL group key survives


def test_mv_incremental_appends(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "mv")
    mf.commit_versioned(_mk(spark, [("a", 1.0), ("b", 2.0)]), base)
    mv.create_mv(spark, view, base, ["k"], AGGS)
    assert mv.refresh_mv(spark, view) == "noop"
    # append touching an existing group, an all-NULL group, a new group
    mf.commit_append(
        _mk(spark, [("a", -3.5), ("b", None), ("c", 7.25), (None, 1.0)]), base
    )
    assert mv.refresh_mv(spark, view) == "incremental"
    assert _read(spark, view) == _expected(spark, base)
    # second append: multi-segment incremental chain stays exact
    mf.commit_append(_mk(spark, [("c", -100.0), ("a", 0.0)]), base)
    assert mv.refresh_mv(spark, view) == "incremental"
    assert _read(spark, view) == _expected(spark, base)


def test_mv_rewrite_falls_back_to_full(spark, tmp_path):
    base, view = str(tmp_path / "base"), str(tmp_path / "mv")
    mf.commit_versioned(
        _mk(spark, [("a", 1.0), ("a", 9.0), ("b", 2.0)]), base
    )
    mv.create_mv(spark, view, base, ["k"], AGGS)
    # deletion rewrites the snapshot: min/max can't be delta-maintained
    mf.delete_rows(spark, base, F.col("value") == 9.0)
    assert mv.refresh_mv(spark, view) == "full"
    assert _read(spark, view) == _expected(spark, base)
    rows = {r.k: r for r in mv.read_mv(spark, view).collect()}
    assert rows["a"].hi == 1.0  # the deleted max is really gone


def test_mv_projection_and_events_volume(spark, sf_dir, tmp_path):
    base, view = str(tmp_path / "events"), str(tmp_path / "mv")
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    seed = ev.filter(F.col("event_id") % 3 == 0)
    mf.commit_versioned(seed, base)
    mv.create_mv(
        spark,
        view,
        base,
        ["event_type", "day"],
        [["n", "count", None], ["total", "sum", "value"],
         ["mean", "avg", "value"]],
        projection=[
            "event_type",
            "CAST(ts AS DATE) AS day",
            "value",
        ],
    )
    mf.commit_append(ev.filter(F.col("event_id") % 3 != 0), base)
    assert mv.refresh_mv(spark, view) == "incremental"
    got = {
        (r.event_type, r.day, r.n, r.total, r.mean)
        for r in mv.read_mv(spark, view).collect()
    }
    want = {
        tuple(r)
        for r in ev.groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total"),
            (
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
                / F.count("value")
            ).alias("mean"),
        )
        .collect()
    }
    assert got == want


def test_mv_bad_kind_rejected(spark, tmp_path):
    base = str(tmp_path / "base")
    mf.commit_versioned(_mk(spark, [("a", 1.0)]), base)
    with pytest.raises(ValueError, match="unknown agg kind"):
        mv.create_mv(
            spark, str(tmp_path / "mv"), base, ["k"],
            [["x", "median", "value"]],
        )


def test_mv_streaming_refresh_two_batches(spark, tmp_path):
    """End-to-end: file-drop stream → base appends → incremental view
    refresh per epoch; after two micro-batches the view equals a
    from-scratch aggregate of everything ingested."""
    src = tmp_path / "in"
    src.mkdir()
    base, view = str(tmp_path / "base"), str(tmp_path / "mv")
    schema = "k STRING, value DOUBLE"

    seed = _mk(spark, [("a", 1.0), ("b", 2.0)])
    mf.commit_versioned(seed, base)
    mv.create_mv(spark, view, base, ["k"], AGGS)

    _mk(spark, [("a", 5.0), ("c", -1.0)]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = mv.run_streaming_mv_refresh(
        spark, stream, base, view, checkpoint_dir=str(tmp_path / "ck")
    )
    try:
        q.processAllAvailable()
        _mk(spark, [("c", 4.0), ("b", None)]).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()
    assert _read(spark, view) == _expected(spark, base)
    # base got exactly two appended segments beyond the seed snapshot
    assert mf.segment_count(base) == 3


def test_mv_approx_distinct_incremental_equals_scratch(spark, tmp_path):
    """HLL sketches are mergeable: the incrementally-unioned sketch
    must estimate IDENTICALLY to one built from scratch over the full
    base (sketch determinism), and land within the HLL error band of
    the exact count."""
    base, view = str(tmp_path / "base"), str(tmp_path / "mv")
    rows1 = [("g", float(i % 40)) for i in range(200)]
    rows2 = [("g", float((i % 70) + 25)) for i in range(200)]
    mf.commit_versioned(_mk(spark, rows1), base)
    mv.create_mv(
        spark, view, base, ["k"],
        [["n", "count", None], ["nd", "approx_distinct", "value"]],
    )
    mf.commit_append(_mk(spark, rows2), base)
    assert mv.refresh_mv(spark, view) == "incremental"
    got = {r.k: (r.n, r.nd) for r in mv.read_mv(spark, view).collect()}

    scratch_view = str(tmp_path / "mv2")
    mv.create_mv(
        spark, scratch_view, base, ["k"],
        [["n", "count", None], ["nd", "approx_distinct", "value"]],
    )
    scratch = {
        r.k: (r.n, r.nd)
        for r in mv.read_mv(spark, scratch_view).collect()
    }
    assert got == scratch  # merged sketch == from-scratch sketch
    exact = mf.read_versioned(spark, base).select("value").distinct().count()
    n, nd = got["g"]
    assert n == 400
    assert abs(nd - exact) / exact < 0.05


def test_mv_rollup_to_coarser_grain(spark, sf_dir, tmp_path):
    """rollup_mv answers a coarser aggregate EXACTLY from view state:
    per-event_type results from a (event_type, day) view equal a
    direct aggregate of the base — including AVG recombined from the
    sum/count pair (not an average of daily averages) and HLL distinct
    unioned across days."""
    base, view = str(tmp_path / "events"), str(tmp_path / "mv")
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value", "user_id"
    )
    mf.commit_versioned(ev, base)
    mv.create_mv(
        spark,
        view,
        base,
        ["event_type", "day"],
        [["n", "count", None], ["total", "sum", "value"],
         ["mean", "avg", "value"], ["users", "approx_distinct", "user_id"]],
        projection=[
            "event_type", "CAST(ts AS DATE) AS day", "value", "user_id",
        ],
    )
    got = {
        r.event_type: (r.n, r.total, r.mean, r.users)
        for r in mv.rollup_mv(spark, view, ["event_type"]).collect()
    }
    scratch_view = str(tmp_path / "mv_coarse")
    mv.create_mv(
        spark,
        scratch_view,
        base,
        ["event_type"],
        [["n", "count", None], ["total", "sum", "value"],
         ["mean", "avg", "value"], ["users", "approx_distinct", "user_id"]],
        projection=["event_type", "value", "user_id"],
    )
    want = {
        r.event_type: (r.n, r.total, r.mean, r.users)
        for r in mv.read_mv(spark, scratch_view).collect()
    }
    assert got == want  # incl. identical HLL estimates (sketch union)


def test_mv_rollup_rejects_non_subset(spark, sf_dir, tmp_path):
    base, view = str(tmp_path / "b"), str(tmp_path / "v")
    mf.commit_versioned(_mk(spark, [("a", 1.0)]), base)
    mv.create_mv(spark, view, base, ["k"], [["n", "count", None]])
    with pytest.raises(ValueError, match="not in the view's group"):
        mv.rollup_mv(spark, view, ["nope"])


def test_mv_single_refresh_folds_multiple_appends(spark, tmp_path):
    """The self-heal claim: a refresh after TWO un-refreshed appends
    (e.g. a crash between append and refresh) folds both new segments
    in one incremental pass."""
    base, view = str(tmp_path / "base"), str(tmp_path / "mv")
    mf.commit_versioned(_mk(spark, [("a", 1.0)]), base)
    mv.create_mv(spark, view, base, ["k"], AGGS)
    mf.commit_append(_mk(spark, [("a", 2.0), ("b", 3.0)]), base)
    mf.commit_append(_mk(spark, [("b", -1.0), ("c", 9.0)]), base)
    assert mv.refresh_mv(spark, view) == "incremental"
    assert _read(spark, view) == _expected(spark, base)


def test_mv_rejects_duplicate_or_clashing_output_names(spark, tmp_path):
    base = str(tmp_path / "base")
    mf.commit_versioned(_mk(spark, [("a", 1.0)]), base)
    with pytest.raises(ValueError, match="unique"):
        mv.create_mv(spark, str(tmp_path / "v1"), base, ["k"],
                     [["n", "count", None], ["n", "sum", "value"]])
    with pytest.raises(ValueError, match="unique"):
        mv.create_mv(spark, str(tmp_path / "v2"), base, ["k"],
                     [["k", "count", None]])


def test_mv_spec_rides_in_manifest_atomically(spark, tmp_path):
    """The spec publishes INSIDE the state commit's manifest document:
    no sibling _MV_SPEC file exists to be swept or torn, every commit's
    meta records exactly the base snapshot its state reflects, and the
    time-travel history copies carry the spec that described THAT
    state."""
    import os

    base, view = str(tmp_path / "base"), str(tmp_path / "mv")
    mf.commit_versioned(_mk(spark, [("a", 1.0), ("b", 2.0)]), base)
    mv.create_mv(spark, view, base, ["k"], AGGS)
    assert not os.path.exists(os.path.join(view, mv.MV_SPEC))
    spec1 = mf.table_meta(view)["mv_spec"]
    assert spec1["base_version"] == mf.current_version(base)

    mf.commit_append(_mk(spark, [("a", 3.0)]), base)
    assert mv.refresh_mv(spark, view) == "incremental"
    # the old failure mode: the post-publish sweep deleted the spec
    # file on every commit after the first — view unreadable on crash
    assert not os.path.exists(os.path.join(view, mv.MV_SPEC))
    spec2 = mf.table_meta(view)["mv_spec"]
    assert spec2["base_segments"] == mf._read_manifest(base)["segments"]
    assert _read(spark, view) == _expected(spark, base)
    # history copy of the FIRST commit still carries the first spec
    v1_meta = mf.table_meta(view, version=1)
    assert v1_meta["mv_spec"]["base_segments"] == spec1["base_segments"]


def test_mv_legacy_spec_file_still_readable_and_migrates(spark, tmp_path):
    """A view created before the migration (spec in a sibling file,
    no manifest meta) stays readable, and its first refresh publishes
    the spec into the manifest."""
    import json
    import os

    base, view = str(tmp_path / "base"), str(tmp_path / "mv")
    mf.commit_versioned(_mk(spark, [("a", 1.0), ("b", 2.0)]), base)
    mv.create_mv(spark, view, base, ["k"], AGGS)
    # devolve to the legacy layout: spec file present, meta absent
    spec = mf.table_meta(view)["mv_spec"]
    with open(os.path.join(view, mv.MV_SPEC), "w") as fh:
        json.dump(spec, fh)
    doc = mf._read_manifest(view)
    del doc["meta"]
    mf._write_json_atomic(mf._manifest_path(view), doc)

    assert _read(spark, view) == _expected(spark, base)  # file fallback
    mf.commit_append(_mk(spark, [("c", 9.0)]), base)
    assert mv.refresh_mv(spark, view) == "incremental"
    assert mf.table_meta(view)["mv_spec"]["base_segments"] == (
        mf._read_manifest(base)["segments"]
    )
    assert _read(spark, view) == _expected(spark, base)


def test_mv_hll_combine_survives_all_null_delta(spark, tmp_path):
    """hll_sketch_agg over an all-NULL batch yields a NULL partial;
    combining it must KEEP the other side's real sketch (the unguarded
    hll_union(real, NULL) returned NULL and erased the group's
    distinct state). Covers both directions: existing group + all-NULL
    delta, and a group BORN all-NULL later gaining real values."""
    base, view = str(tmp_path / "base"), str(tmp_path / "mv")
    aggs = [["n", "count", None], ["nd", "approx_distinct", "value"]]
    mf.commit_versioned(
        _mk(spark, [("a", 1.0), ("a", 2.0), ("b", None)]), base
    )
    mv.create_mv(spark, view, base, ["k"], aggs)
    mf.commit_append(
        _mk(spark, [("a", None), ("a", None), ("b", 7.0)]), base
    )
    assert mv.refresh_mv(spark, view) == "incremental"
    got = {r.k: (r.n, r.nd) for r in mv.read_mv(spark, view).collect()}

    scratch = str(tmp_path / "mv2")
    mv.create_mv(spark, scratch, base, ["k"], aggs)
    want = {r.k: (r.n, r.nd) for r in mv.read_mv(spark, scratch).collect()}
    assert got == want
    assert got["a"] == (4, 2)  # real sketch survived the NULL delta
    assert got["b"] == (2, 1)  # NULL-born group absorbed the real value


HIST = {
    "lo": 0.0,
    "hi": 8.0,
    "bins": 4,
    "quantiles": {"p50": 0.5, "p95": 0.95},
}


def _hist_ref(values, q, lo=0.0, hi=8.0, bins=4):
    """Step-quantile reference: upper edge of the first bucket whose
    cumulative count reaches ceil(q*N)."""
    import math

    vals = [v for v in values if v is not None]
    if not vals:
        return None
    counts = [0] * (bins + 2)
    for v in vals:
        if v < lo:
            b = 0
        elif v >= hi:
            b = bins + 1
        else:
            b = int(math.floor((v - lo) * bins / (hi - lo))) + 1
        counts[b] += 1
    target = math.ceil(q * len(vals))
    cum = 0
    for i, c in enumerate(counts):
        cum += c
        if cum >= target:
            if i <= 0:
                return lo
            if i >= bins + 1:
                return hi
            return round(lo + (i * (hi - lo)) / bins, 6)
    raise AssertionError("unreachable")


def test_mv_hist_incremental_equals_scratch_and_reference(spark, tmp_path):
    """Histogram state absorbs appends exactly: refresh-then-read ==
    from-scratch == the pure-Python step-quantile reference, including
    underflow (-3.0) and overflow (9.5, 100.0) values."""
    base, view = str(tmp_path / "hb"), str(tmp_path / "hmv")
    batches = [
        [("a", 1.0), ("a", 3.0), ("b", 9.5)],
        [("a", -3.0), ("b", 2.0), ("a", 7.9)],
        [("b", 100.0), ("a", 0.0), ("b", 4.0)],
    ]
    data = {}
    mf.commit_versioned(_mk(spark, batches[0]), base)
    mv.create_mv(
        spark, view, base, ["k"],
        [["n", "count", None], ["value", "hist", "value", HIST]],
    )
    for k, v in batches[0]:
        data.setdefault(k, []).append(v)
    for batch in batches[1:]:
        mf.commit_append(_mk(spark, batch), base)
        assert mv.refresh_mv(spark, view) == "incremental"
        for k, v in batch:
            data.setdefault(k, []).append(v)
        got = {
            r["k"]: (r["n"], r["value_p50"], r["value_p95"])
            for r in mv.read_mv(spark, view).collect()
        }
        want = {
            k: (
                len(vs),
                _hist_ref(vs, 0.5),
                _hist_ref(vs, 0.95),
            )
            for k, vs in data.items()
        }
        assert got == want
    # from-scratch view over the final base must read identically
    view2 = str(tmp_path / "hmv2")
    mv.create_mv(
        spark, view2, base, ["k"],
        [["n", "count", None], ["value", "hist", "value", HIST]],
    )
    assert _read(spark, view) == _read(spark, view2)


def test_mv_hist_all_null_group_yields_null_quantiles(spark, tmp_path):
    base, view = str(tmp_path / "nb"), str(tmp_path / "nmv")
    mf.commit_versioned(
        _mk(spark, [("a", 1.0), ("z", None)]), base
    )
    mv.create_mv(
        spark, view, base, ["k"],
        [["n", "count", None], ["value", "hist", "value", HIST]],
    )
    # an all-NULL delta for an existing group must not corrupt state
    mf.commit_append(_mk(spark, [("a", None), ("z", None)]), base)
    assert mv.refresh_mv(spark, view) == "incremental"
    got = {
        r["k"]: (r["n"], r["value_p50"], r["value_p95"])
        for r in mv.read_mv(spark, view).collect()
    }
    assert got == {"a": (2, 2.0, 2.0), "z": (2, None, None)}


def test_mv_hist_rollup_re_aggregates_bucket_arrays(spark, tmp_path):
    """Rolling a (k, k2) histogram view up to (k) must equal a view
    built at (k) directly — bucket arrays add element-wise."""
    rows = [
        ("a", "x", 1.0), ("a", "x", 6.0), ("a", "y", 3.0),
        ("b", "x", 9.0), ("b", "y", -1.0), ("b", "y", 5.0),
    ]
    base = str(tmp_path / "rb")
    mf.commit_versioned(
        spark.createDataFrame(rows, "k STRING, k2 STRING, value DOUBLE"),
        base,
    )
    fine, coarse = str(tmp_path / "fine"), str(tmp_path / "coarse")
    aggs = [["n", "count", None], ["value", "hist", "value", HIST]]
    mv.create_mv(spark, fine, base, ["k", "k2"], aggs)
    mv.create_mv(spark, coarse, base, ["k"], aggs)
    rolled = {
        tuple(r) for r in mv.rollup_mv(spark, fine, ["k"]).collect()
    }
    direct = {tuple(r) for r in mv.read_mv(spark, coarse).collect()}
    assert rolled == direct


def test_mv_hist_rejects_bad_params(spark, tmp_path):
    base = str(tmp_path / "vb")
    mf.commit_versioned(_mk(spark, [("a", 1.0)]), base)
    bad = [
        None,
        {"lo": 1.0, "hi": 1.0, "bins": 4, "quantiles": {"p50": 0.5}},
        {"lo": 0.0, "hi": 8.0, "bins": 0, "quantiles": {"p50": 0.5}},
        {"lo": 0.0, "hi": 8.0, "bins": 4, "quantiles": {}},
        {"lo": 0.0, "hi": 8.0, "bins": 4, "quantiles": {"p0": 0.0}},
    ]
    for p in bad:
        entry = ["v", "hist", "value"] + ([p] if p is not None else [])
        with pytest.raises(ValueError):
            mv.create_mv(spark, str(tmp_path / "vmv"), base, ["k"], [entry])


@pytest.mark.parametrize("crash_point", ["before_refresh", "after_refresh"])
def test_mv_streaming_crash_restart_exactly_once(
    spark, tmp_path, monkeypatch, crash_point
):
    """Crash the streaming MV pipeline BETWEEN the base-table commit
    and the checkpoint advance, restart from the checkpoint, and
    assert exactly-once: the replayed epoch's txn=("mv-base", batchId)
    commit dedupes (sources/manifest.py commit_append), so the base
    gets each micro-batch once and the view never double-counts.

    Both sides of the claimed crash window are exercised:
    - ``before_refresh``: base committed, refresh never ran — the
      restart's replay must skip the commit and fold the orphaned
      segment (self-heal).
    - ``after_refresh``: base committed AND view refreshed, crash just
      before the checkpoint advances — the replay must skip the commit
      and the refresh must see an unchanged base and no-op.

    The abort is an exception raised inside foreachBatch, which kills
    the query before Structured Streaming writes the epoch's commit
    marker — from the checkpoint's perspective the same failure point
    as kill -9 between state commit and checkpoint advance. (Reference
    analogue: update_live_price.py's tmp+rename crash story; here the
    guarantee is transactional replay, not atomic rename.)
    """
    src = tmp_path / "in"
    src.mkdir()
    base, view = str(tmp_path / "base"), str(tmp_path / "mv")
    schema = "k STRING, value DOUBLE"
    mf.commit_versioned(_mk(spark, [("a", 1.0), ("b", 2.0)]), base)
    mv.create_mv(spark, view, base, ["k"], AGGS)
    _mk(spark, [("a", 5.0), ("c", -1.0)]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    _mk(spark, [("c", 4.0), ("b", None)]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    real_refresh = mv.refresh_mv
    crashed = {}

    def crashing_refresh(s, table):
        if not crashed:
            crashed["tripped"] = True
            if crash_point == "after_refresh":
                real_refresh(s, table)
            raise RuntimeError("injected crash before checkpoint advance")
        return real_refresh(s, table)

    monkeypatch.setattr(mv, "refresh_mv", crashing_refresh)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = mv.run_streaming_mv_refresh(
        spark, stream, base, view, checkpoint_dir=str(tmp_path / "ck")
    )
    with pytest.raises(Exception, match="injected crash"):
        q.processAllAvailable()
    q.stop()
    assert crashed, "the injected crash never fired"

    monkeypatch.setattr(mv, "refresh_mv", real_refresh)
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q2 = mv.run_streaming_mv_refresh(
        spark, stream2, base, view, checkpoint_dir=str(tmp_path / "ck")
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    # exactly-once on the base: seed + ONE segment per micro-batch —
    # a re-committed replay would add a 4th segment and 2 extra rows
    assert mf.segment_count(base) == 3
    assert mf.read_versioned(spark, base).count() == 6
    assert _read(spark, view) == _expected(spark, base)


# ---------------------------------------------------------------- topk


def _mg_reference(counts: dict, capacity: int) -> dict:
    """Pure-Python Misra-Gries offset construction over exact counts:
    keep the top `capacity` by (count DESC, value ASC), subtract the
    (capacity+1)-th largest count, drop non-positive."""
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    pivot = ranked[capacity][1] if len(ranked) > capacity else 0
    return {
        v: c - pivot for v, c in ranked[:capacity] if c - pivot > 0
    }


def _mg_merge_reference(a: dict, b: dict, capacity: int) -> dict:
    summed = dict(a)
    for v, c in b.items():
        summed[v] = summed.get(v, 0) + c
    return _mg_reference(summed, capacity)


def _topk_rows(spark, view):
    return {
        r.k: tuple(r)[1:] for r in mv.read_mv(spark, view).collect()
    }


def test_mv_topk_exact_regime_incremental_equals_scratch(spark, tmp_path):
    """capacity ≥ per-group distinct: no truncation anywhere, state is
    exact and merge-order-independent — incremental == scratch ==
    plain top-k over the union."""
    base, view = str(tmp_path / "base"), str(tmp_path / "mv")
    rows1 = [("a", v) for v in "xxyz"] + [("b", "q"), ("b", None)]
    rows2 = [("a", "y")] * 3 + [("b", "r"), (None, "n")]
    mf.commit_versioned(_mk_s(spark, rows1), base)
    aggs = [["n", "count", None],
            ["top", "topk", "v", {"capacity": 8, "k": 2}]]
    mv.create_mv(spark, view, base, ["k"], aggs)
    mf.commit_append(_mk_s(spark, rows2), base)
    assert mv.refresh_mv(spark, view) == "incremental"

    scratch = str(tmp_path / "mv2")
    mv.create_mv(spark, scratch, base, ["k"], aggs)
    assert _topk_rows(spark, view) == _topk_rows(spark, scratch)
    got = _topk_rows(spark, view)
    # ties break by value ascending; NULL values are never counted
    assert got["a"] == (7, "y", 4, "x", 2)
    assert got["b"] == (3, "q", 1, "r", 1)
    assert got[None] == (1, "n", 1, None, None)


def _mk_s(spark, rows):
    return spark.createDataFrame(rows, "k STRING, v STRING")


def test_mv_topk_lossy_matches_python_reference_and_error_bound(
    spark, tmp_path
):
    """capacity < distinct: the Spark state after create + 2 appends
    must equal the pure-Python MG reference merged in the same order,
    and obey the summary guarantees: every value with true count >
    N/(capacity+1) present; surviving counts underestimate true counts
    by at most N/(capacity+1)."""
    import collections

    cap = 4
    batches = [
        [("g", f"v{i % 9}") for i in range(120)],
        [("g", f"v{i % 7}") for i in range(90)],
        [("g", f"w{i % 5}") for i in range(60)],
    ]
    base, view = str(tmp_path / "base"), str(tmp_path / "mv")
    mf.commit_versioned(_mk_s(spark, batches[0]), base)
    mv.create_mv(
        spark, view, base, ["k"],
        [["top", "topk", "v", {"capacity": cap, "k": cap}],
         ["n", "count", None]],
    )
    ref = _mg_reference(
        collections.Counter(v for _, v in batches[0]), cap
    )
    for batch in batches[1:]:
        mf.commit_append(_mk_s(spark, batch), base)
        assert mv.refresh_mv(spark, view) == "incremental"
        ref = _mg_merge_reference(
            ref,
            _mg_reference(collections.Counter(v for _, v in batch), cap),
            cap,
        )

    state = mf.read_versioned(spark, view).collect()[0]
    assert dict(state["__top_topk"]) == ref

    true = collections.Counter(v for b in batches for _, v in b)
    n_total = sum(true.values())
    eps = n_total / (cap + 1)
    got = dict(state["__top_topk"])
    for v, c in true.items():
        if c > eps:
            assert v in got, f"heavy hitter {v} (count {c}) missing"
    for v, c in got.items():
        assert c <= true[v], "MG must never overcount"
        assert true[v] - c <= eps, "MG undercount beyond N/(c+1)"


def test_mv_topk_rollup(spark, tmp_path):
    """Rollup re-merges the per-(k,sub) maps to per-k: in the exact
    regime the rolled top-k equals a direct top-k at the coarse
    grain."""
    base, view = str(tmp_path / "base"), str(tmp_path / "mv")
    rows = [
        ("a", "s1", "x"), ("a", "s1", "x"), ("a", "s2", "x"),
        ("a", "s2", "y"), ("a", "s2", "y"), ("a", "s1", "z"),
        ("b", "s1", "p"),
    ]
    mf.commit_versioned(
        spark.createDataFrame(rows, "k STRING, sub STRING, v STRING"),
        base,
    )
    mv.create_mv(
        spark, view, base, ["k", "sub"],
        [["n", "count", None],
         ["top", "topk", "v", {"capacity": 8, "k": 2}]],
    )
    got = {
        r.k: (r.n, r.top_1, r.top_1_n, r.top_2, r.top_2_n)
        for r in mv.rollup_mv(spark, view, ["k"]).collect()
    }
    assert got == {
        "a": (6, "x", 3, "y", 2),
        "b": (1, "p", 1, None, None),
    }


def test_mv_topk_only_view_and_param_validation(spark, tmp_path):
    """A view whose ONLY agg is topk still round-trips (the __rows
    placeholder state combines), and bad params fail at create."""
    base = str(tmp_path / "base")
    mf.commit_versioned(_mk_s(spark, [("a", "x"), ("a", "y")]), base)
    view = str(tmp_path / "mv")
    mv.create_mv(
        spark, view, base, ["k"],
        [["top", "topk", "v", {"capacity": 4, "k": 1}]],
    )
    mf.commit_append(_mk_s(spark, [("a", "y"), ("b", "z")]), base)
    assert mv.refresh_mv(spark, view) == "incremental"
    got = {r.k: (r.top_1, r.top_1_n)
           for r in mv.read_mv(spark, view).collect()}
    assert got == {"a": ("y", 2), "b": ("z", 1)}
    for bad in (None, {}, {"capacity": 0, "k": 1}, {"capacity": 4},
                {"capacity": 4, "k": 5}):
        entry = ["t", "topk", "v"] if bad is None else ["t", "topk", "v", bad]
        with pytest.raises(ValueError, match="topk needs params"):
            mv.create_mv(
                spark, str(tmp_path / "bad"), base, ["k"], [entry]
            )


# --------------------------------------------------------------- bloom


def _bloom_bits_py(v: str, m: int = 1920, k: int = 4) -> list[int]:
    """Pure-Python twin of matview._bloom_bits (Kirsch-Mitzenmacher
    over the two md5-int60 halves, stride forced odd)."""
    import hashlib

    hx = hashlib.md5(v.encode()).hexdigest()
    h1 = int(hx[:15], 16) % m
    h2m = int(hx[15:30], 16) % m
    h2o = h2m + (1 - (h2m % 2))
    return [(h1 + j * h2o) % m for j in range(k)]


def test_mv_bloom_state_matches_python_and_is_order_independent(
    spark, tmp_path
):
    """The committed word array equals the pure-Python construction
    exactly, and incremental == scratch unconditionally (bit-OR is
    order-independent — no lossy regime to carve out)."""
    base, view = str(tmp_path / "base"), str(tmp_path / "mv")
    vals1 = [f"u{i}" for i in range(30)]
    vals2 = [f"w{i}" for i in range(20)]
    mf.commit_versioned(_mk_s(spark, [("g", v) for v in vals1]), base)
    aggs = [["seen", "bloom", "v", {"m": 1920, "hashes": 4}]]
    mv.create_mv(spark, view, base, ["k"], aggs)
    mf.commit_append(
        _mk_s(spark, [("g", v) for v in vals2] + [("g", None)]), base
    )
    assert mv.refresh_mv(spark, view) == "incremental"

    words = [0] * 32
    for v in vals1 + vals2:
        for b in _bloom_bits_py(v):
            words[b // 60] |= 1 << (b % 60)
    state = mf.read_versioned(spark, view).collect()[0]
    assert list(state["__seen_bloom"]) == words

    scratch = str(tmp_path / "mv2")
    mv.create_mv(spark, scratch, base, ["k"], aggs)
    assert (
        mf.read_versioned(spark, scratch).collect()[0]["__seen_bloom"]
        == state["__seen_bloom"]
    )


def test_mv_bloom_probe_no_false_negatives_and_bounded_fpr(
    spark, tmp_path
):
    """Every inserted value probes 1 (the Bloom contract); a disjoint
    probe set's false-positive rate stays within 3x the analytic
    (1 - e^{-kn/m})^k bound."""
    import math

    base, view = str(tmp_path / "base"), str(tmp_path / "mv")
    n, m, k = 120, 1920, 4
    seen = [f"u{i}" for i in range(n)]
    mf.commit_versioned(_mk_s(spark, [("g", v) for v in seen]), base)
    mv.create_mv(
        spark, view, base, ["k"],
        [["seen", "bloom", "v", {"m": m, "hashes": k}]],
    )
    probes = _mk_s(
        spark,
        [("g", v) for v in seen]
        + [("g", f"miss{i}") for i in range(3000)]
        + [("other", "u0"), ("g", None)],
    )
    got = {
        (r.k, r.v): r.might_contain
        for r in mv.bloom_probe_mv(spark, view, probes, "seen", "v").collect()
    }
    assert all(got[("g", v)] == 1 for v in seen), "false negative"
    assert got[("other", "u0")] == 0  # unseen group -> NULL state -> 0
    assert got[("g", None)] == 0
    fpr = sum(got[("g", f"miss{i}")] for i in range(3000)) / 3000
    bound = (1 - math.exp(-k * n / m)) ** k
    assert fpr <= 3 * bound + 0.01, (fpr, bound)


def test_mv_bloom_rollup_unions_groups(spark, tmp_path):
    """Rolling up (k, sub) -> (k) ORs the sub-filters: every value
    inserted under ANY sub still probes 1 at the coarse grain."""
    base, view = str(tmp_path / "base"), str(tmp_path / "mv")
    rows = [("a", "s1", "x"), ("a", "s2", "y"), ("b", "s1", "z")]
    mf.commit_versioned(
        spark.createDataFrame(rows, "k STRING, sub STRING, v STRING"),
        base,
    )
    mv.create_mv(
        spark, view, base, ["k", "sub"],
        [["seen", "bloom", "v", {"m": 1920, "hashes": 4}],
         ["n", "count", None]],
    )
    rolled = mv.rollup_mv(spark, view, ["k"])
    got = {r.k: (r.seen_bits, r.n) for r in rolled.collect()}
    # 2 values x 4 hashes per group-a filter (collisions possible)
    assert got["a"][1] == 2 and 4 <= got["a"][0] <= 8
    assert got["b"][1] == 1 and 1 <= got["b"][0] <= 4
    # cross-check the rolled bit count against python
    words = [0] * 32
    for v in ("x", "y"):
        for b in _bloom_bits_py(v):
            words[b // 60] |= 1 << (b % 60)
    assert got["a"][0] == sum(bin(w).count("1") for w in words)


def test_mv_bloom_param_validation(spark, tmp_path):
    base = str(tmp_path / "base")
    mf.commit_versioned(_mk_s(spark, [("a", "x")]), base)
    for bad in (None, {}, {"m": 1919, "hashes": 4},
                {"m": 0, "hashes": 4}, {"m": 1920, "hashes": 0},
                {"m": 1920, "hashes": 9}, {"m": 1 << 21, "hashes": 4}):
        entry = (["s", "bloom", "v"] if bad is None
                 else ["s", "bloom", "v", bad])
        with pytest.raises(ValueError, match="bloom needs params"):
            mv.create_mv(spark, str(tmp_path / "bad"), base, ["k"], [entry])
    with pytest.raises(ValueError, match="no bloom agg named"):
        view = str(tmp_path / "ok")
        mv.create_mv(
            spark, view, base, ["k"],
            [["s", "bloom", "v", {"m": 1920, "hashes": 4}]],
        )
        mv.bloom_probe_mv(
            spark, view, _mk_s(spark, [("a", "x")]), "nope", "v"
        )
