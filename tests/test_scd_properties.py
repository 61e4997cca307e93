"""Property-based SCD2 checks (hypothesis): incremental ``scd2_apply``
over ANY batch split must equal the one-shot ``scd2_from_changelog``
over the full log, and the build must match a straight-line Python
reference — the fold-back-and-rebuild trick in ``scd2_apply`` is
subtle enough to deserve adversarial inputs (same-ts ties, late
batches, duplicate observations), not just fixtures."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from asset_prices_parquet_saver_spark.operators import scd

obs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),   # key
        st.integers(min_value=0, max_value=5),   # day offset (ties likely)
        st.sampled_from(["x", "y", "z"]),        # attr
    ),
    min_size=1,
    max_size=12,
)


def _rows(obs):
    # obs_id = 100 + position: keeps the tie-break disjoint from the
    # small version numbers scd2_apply folds back in
    return [
        (str(k), dt.datetime(2024, 1, 1 + d), 100 + i, a)
        for i, (k, d, a) in enumerate(obs)
    ]


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, obs_id long, attr string"
    )


def _build(spark, rows):
    return scd.scd2_from_changelog(_mk(spark, rows), "key", "ts", ["attr"], "obs_id")


def _canon(df):
    return sorted(
        (r["key"], r["version"], r["attr"], r["valid_from"], r["valid_to"],
         r["is_current"])
        for r in df.collect()
    )


def _reference(rows):
    """Straight-line SCD2: per key, walk observations in (ts, obs_id)
    order, open a version on every attr change."""
    by_key: dict[str, list] = {}
    for k, ts, oid, a in rows:
        by_key.setdefault(k, []).append((ts, oid, a))
    out = []
    for k, obs in by_key.items():
        obs.sort()
        versions = []
        for ts, _, a in obs:
            if not versions or versions[-1][1] != a:
                versions.append((ts, a))
        for i, (ts, a) in enumerate(versions):
            nxt = versions[i + 1][0] if i + 1 < len(versions) else None
            out.append((k, i + 1, a, ts, nxt, nxt is None))
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(obs=obs_strategy)
def test_build_matches_reference(spark, obs):
    assert _canon(_build(spark, _rows(obs))) == _reference(_rows(obs))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(obs=obs_strategy, cut=st.integers(min_value=0, max_value=12))
def test_apply_event_time_split_equals_full_rebuild(spark, obs, cut):
    """The watermarked-streaming contract: batches cut anywhere along
    the global (ts, tiebreak) order rebuild EXACTLY."""
    rows = sorted(_rows(obs), key=lambda r: (r[1], r[2]))
    cut = min(cut, len(rows))
    first, second = rows[:cut], rows[cut:]
    if not first or not second:
        return  # empty side: nothing to merge
    incremental = scd.scd2_apply(
        _build(spark, first), _mk(spark, second), "key", "ts", ["attr"], "obs_id"
    )
    assert _canon(incremental) == _canon(_build(spark, rows))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(obs=obs_strategy, cut=st.integers(min_value=0, max_value=12))
def test_apply_arbitrary_split_preserves_version_sequence(spark, obs, cut):
    """Arbitrarily LATE batches (observations older than already-
    collapsed history): the attr version sequence per key must still
    equal the full rebuild's, and every version boundary must be a
    real observation of its run — only the dating of a version
    re-opened by a late insert may fall back to the retained
    confirmation (interior collapsed repeats are unrecoverable
    without the raw log; documented in scd2_apply)."""
    rows = _rows(obs)
    cut = min(cut, len(rows))
    first, second = rows[:cut], rows[cut:]
    if not first or not second:
        return
    incremental = scd.scd2_apply(
        _build(spark, first), _mk(spark, second), "key", "ts", ["attr"], "obs_id"
    )
    full = _build(spark, rows)

    def seqs(df):
        out: dict[str, list] = {}
        for k, v, a, *_ in sorted(
            (r["key"], r["version"], r["attr"]) for r in df.collect()
        ):
            out.setdefault(k, []).append(a)
        return out

    assert seqs(incremental) == seqs(full)
    observed = {(k, ts, oid, a) for k, ts, oid, a in rows}
    for r in incremental.collect():
        assert (r["key"], r["valid_from"], r["opened_by"], r["attr"]) in observed


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(obs=obs_strategy, cut=st.integers(min_value=0, max_value=12))
def test_apply_with_log_arbitrary_split_is_exact(spark, obs, cut):
    """With raw-log retention on, ANY split — including arbitrarily
    late second batches — rebuilds EXACTLY equal to the one-shot
    full-log build (the gap scd2_apply documents is closed)."""
    rows = _rows(obs)
    cut = min(cut, len(rows))
    first, second = rows[:cut], rows[cut:]
    if not first or not second:
        return
    dim2, log2 = scd.scd2_apply_with_log(
        _build(spark, first), _mk(spark, first), _mk(spark, second),
        "key", "ts", ["attr"], "obs_id",
    )
    assert _canon(dim2) == _canon(_build(spark, rows))
    # the returned log is the full observation multiset (deduped)
    assert sorted(
        (r["key"], r["ts"], r["obs_id"], r["attr"]) for r in log2.collect()
    ) == sorted(set(rows))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    obs=obs_strategy,
    cuts=st.lists(st.integers(min_value=0, max_value=12), min_size=2, max_size=3),
)
def test_apply_with_log_chained_batches_and_replay(spark, obs, cuts):
    """Chained applies over a shuffled log, WITH a replayed batch in
    the middle, still converge to the one-shot build — replays collapse
    in the log's distinct, so retention is idempotent."""
    rows = _rows(obs)
    if len(rows) < 2:
        return
    # deterministic shuffle: interleave halves to force late arrivals
    shuffled = rows[1::2] + rows[0::2]
    bounds = sorted(min(c, len(shuffled)) for c in cuts)
    pieces, prev = [], 0
    for b in [*bounds, len(shuffled)]:
        if b > prev:
            pieces.append(shuffled[prev:b])
            prev = b
    if len(pieces) < 2:
        return
    dim = _build(spark, pieces[0])
    log = _mk(spark, pieces[0])
    for piece in pieces[1:]:
        dim, log = scd.scd2_apply_with_log(
            dim, log, _mk(spark, piece), "key", "ts", ["attr"], "obs_id"
        )
        dim, log = dim.localCheckpoint(), log.localCheckpoint()
    # replay the LAST batch verbatim — must be a no-op
    dim, log = scd.scd2_apply_with_log(
        dim, log, _mk(spark, pieces[-1]), "key", "ts", ["attr"], "obs_id"
    )
    assert _canon(dim) == _canon(_build(spark, rows))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(obs=obs_strategy, cut=st.integers(min_value=1, max_value=11))
def test_log_delta_append_reconstructs_full_log(spark, obs, cut):
    """Persisting the log as append-only DELTA segments (the documented
    commit_append protocol via scd2_log_delta) reconstructs exactly the
    full accumulated log — and a replayed batch yields an EMPTY delta,
    so appends stay idempotent."""
    rows = _rows(obs)
    cut = min(cut, len(rows))
    first, second = rows[:cut], rows[cut:]
    if not first or not second:
        return
    log = _mk(spark, first)
    delta = scd.scd2_log_delta(
        log, _mk(spark, second), "key", "ts", ["attr"], "obs_id"
    )
    appended = log.unionByName(delta)
    _, full_log = scd.scd2_apply_with_log(
        _build(spark, first), log, _mk(spark, second),
        "key", "ts", ["attr"], "obs_id",
    )
    canon = lambda df: sorted(
        (r["key"], r["ts"], r["obs_id"], r["attr"]) for r in df.collect()
    )
    assert canon(appended) == canon(full_log)
    # replayed batch → empty delta
    replay = scd.scd2_log_delta(
        appended, _mk(spark, second), "key", "ts", ["attr"], "obs_id"
    )
    assert replay.count() == 0
