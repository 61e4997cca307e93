"""Slowly-changing-dimension (type 2) maintenance.

The reference persists one-row-per-(symbol, day) price history and
point-updates a "latest" row in place (update_live_price.py:227 —
read-modify-write per tick), i.e. SCD type 1: history of the *price*
is kept but history of mutable symbol *attributes* is overwritten.
This module supplies the type-2 counterpart a warehouse needs for any
mutable dimension (symbol status, listing exchange, user segment):
every attribute change opens a dated version row, so every fact can be
joined to the attribute value that was true at its timestamp.

Spark-first shape: the whole build is two window passes over the same
``(key) PARTITION BY`` ordering — one hash shuffle on the key, the
second window reuses the first's exchange (Catalyst sees compatible
partitioning), no global sort anywhere. The incremental apply touches
only the keys present in the batch (semi/anti-join split), so a
steady-state trickle of changes re-versions a vanishing fraction of a
100 TB dimension instead of rewriting it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _attr_struct(attr_cols: list[str]) -> Column:
    return F.struct(*[F.col(c) for c in attr_cols])


def scd2_from_changelog(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str,
) -> DataFrame:
    """Collapse an observation log into SCD2 version rows.

    Input: one row per observation ``(key, ts, attrs..., tiebreak)``;
    repeated observations of the same attribute values do NOT open a
    new version (run-collapse via a null-safe lag comparison — plain
    ``!=`` would silently drop NULL-attribute transitions). Output: one
    row per version with ``valid_from`` / ``valid_to`` (NULL = open),
    ``version`` (1-based per key), ``is_current``.

    Total order within a key is ``(ts, tiebreak)`` so same-timestamp
    observations resolve deterministically on every engine.

    Besides the version bounds, each row keeps two observation
    identities the incremental path needs: ``opened_by`` (the opening
    observation's tie-break) and ``last_observed``/``last_observed_by``
    (the final collapsed repeat CONFIRMING the version — for the open
    version, the key's latest observation overall). Without the
    confirmation, a late observation arriving between a version's
    opener and its last repeat would erase history the repeat should
    re-open (found by hypothesis in tests/test_scd_properties.py).

    All three windows share one key-hash exchange (plan-asserted).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    w_all = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cur = _attr_struct(attr_cols)
    rows = (
        changes.select(key_col, ts_col, tiebreak_col, *attr_cols)
        .withColumn("_prev", F.lag(cur).over(w))
        .withColumn("_prev_ts", F.lag(ts_col).over(w))
        .withColumn("_prev_tb", F.lag(tiebreak_col).over(w))
        .withColumn(
            "_key_last",
            F.max(F.struct(F.col(ts_col), F.col(tiebreak_col))).over(w_all),
        )
    )
    starts = rows.filter(
        F.col("_prev").isNull() | ~F.col("_prev").eqNullSafe(cur)
    )
    # same partitioning + ordering as `w`: Catalyst reuses the exchange
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    # version k's last confirmation = the row right before version
    # k+1's opener (contiguous run), surfaced via lead(_prev_*); the
    # open version's confirmation = the key's overall last observation
    return starts.select(
        F.col(key_col),
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
        F.col(tiebreak_col).alias("opened_by"),
        F.coalesce(
            F.lead("_prev_ts").over(w2), F.col("_key_last")[ts_col]
        ).alias("last_observed"),
        F.coalesce(
            F.lead("_prev_tb").over(w2), F.col("_key_last")[tiebreak_col]
        ).alias("last_observed_by"),
    )


def scd2_apply(
    dim: DataFrame,
    batch: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str,
) -> DataFrame:
    """Merge a batch of new observations into an existing SCD2 dimension.

    Only keys present in the batch are re-versioned: their existing
    version rows fold back into changelog form — BOTH the opening
    observation (valid_from, opened_by) and the last confirming one
    (last_observed, last_observed_by) per version — and rebuild
    together with the batch; untouched keys pass through verbatim via
    an anti-join. Idempotent for replayed batches (duplicate
    observations collapse in the run-filter).

    Equivalence contract (property-asserted in
    tests/test_scd_properties.py): for batches split anywhere along
    the (ts, tiebreak) event-time order — the watermarked streaming
    case — the incremental result EQUALS the one-shot full-log build.
    For arbitrarily late data the attr version sequence still matches
    the full rebuild and every boundary is a real observation of its
    run, but a version re-opened by a late insert may date from its
    retained confirmation rather than an interior collapsed repeat
    (interior repeats are unrecoverable without retaining the raw log
    — if exact late-data rebuilds matter, keep the changelog and
    rebuild affected keys from it).
    """
    # No forced broadcast: a streaming micro-batch's key set is tiny
    # and AQE broadcasts it at runtime anyway, but the SAME entry point
    # serves full-changelog rebuilds (cli batch mode / first build)
    # where the key set is every key in the dimension — a broadcast
    # hint there collects an unbounded set to the driver. Letting the
    # planner choose degrades the backfill to a shuffle join instead
    # of an OOM.
    keys = batch.select(key_col).distinct()
    untouched = dim.join(keys, key_col, "left_anti")
    affected = dim.join(keys, key_col, "left_semi")
    openers = affected.select(
        F.col(key_col),
        F.col("valid_from").alias(ts_col),
        F.col("opened_by").alias(tiebreak_col),
        *attr_cols,
    )
    # Null-safe inequality: with plain !=, a same-timestamp confirm
    # whose opener has a NULL tiebreak evaluates (x != NULL) -> NULL ->
    # row filtered -> a genuine confirming observation silently lost,
    # which is exactly the late-data history erasure this fold-back
    # exists to prevent (regression-pinned in tests/test_scd.py).
    confirms = affected.filter(
        ~F.col("last_observed").eqNullSafe(F.col("valid_from"))
        | ~F.col("last_observed_by").eqNullSafe(F.col("opened_by"))
    ).select(
        F.col(key_col),
        F.col("last_observed").alias(ts_col),
        F.col("last_observed_by").alias(tiebreak_col),
        *attr_cols,
    )
    affected_log = openers.unionByName(confirms)
    merged_log = affected_log.unionByName(
        batch.select(key_col, ts_col, tiebreak_col, *attr_cols)
    )
    rebuilt = scd2_from_changelog(
        merged_log, key_col, ts_col, attr_cols, tiebreak_col
    )
    return untouched.unionByName(rebuilt)


def scd2_apply_with_log(
    dim: DataFrame,
    log: DataFrame,
    batch: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Opt-in EXACT variant of :func:`scd2_apply`: retain the raw
    observation log beside the version table so arbitrarily late data
    rebuilds exactly.

    :func:`scd2_apply` folds version rows back into changelog form,
    which keeps each version's opener and last confirmation but loses
    INTERIOR collapsed repeats — so a late observation landing between
    a version's opener and an interior repeat can date the re-opened
    version from the retained confirmation instead of the true repeat
    (documented there; found by hypothesis). Retaining the log closes
    that gap: affected keys rebuild from the full observation history,
    so the result EQUALS the one-shot full-log build for ANY batch
    order (property-asserted in tests/test_scd_properties.py).

    Returns ``(new_dim, new_log)`` where ``new_log`` is the FULL
    accumulated observation log (convenient for chaining applies). The
    log grows by O(batch) per apply (exact replays collapse via
    distinct). To persist it beside the dimension, append ONLY the
    batch's new rows — :func:`scd2_log_delta` computes that O(batch)
    segment for ``manifest.commit_append`` — or rewrite the full log
    with ``commit_versioned``; appending ``new_log`` itself would
    re-append the entire history every apply (O(k·|log|) storage after
    k applies). The dimension goes through ``commit_versioned``.
    Storage is the honest price of exact late-data replay; the default
    :func:`scd2_apply` remains the cheap mode for event-time-ordered
    (watermarked) feeds, which it already rebuilds exactly.

    Scale shape: identical to :func:`scd2_apply` — only keys present
    in the batch are touched (semi/anti split), the rebuild window
    shuffles once on the key, and the log union/dedup is keyed on the
    same columns.
    """
    cols = [key_col, ts_col, tiebreak_col, *attr_cols]
    new_log = (
        log.select(*cols).unionByName(batch.select(*cols)).distinct()
    )
    keys = batch.select(key_col).distinct()
    untouched = dim.join(keys, key_col, "left_anti")
    affected_log = new_log.join(keys, key_col, "left_semi")
    rebuilt = scd2_from_changelog(
        affected_log, key_col, ts_col, attr_cols, tiebreak_col
    )
    return untouched.unionByName(rebuilt), new_log


def scd2_log_delta(
    log: DataFrame,
    batch: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str,
) -> DataFrame:
    """The O(batch) appendable log segment for one apply: batch
    observations not already present in the persisted log (exact
    replays produce an EMPTY delta). ``commit_append`` this beside the
    dimension instead of the full accumulated log
    :func:`scd2_apply_with_log` returns — see its docstring."""
    cols = [key_col, ts_col, tiebreak_col, *attr_cols]
    return (
        batch.select(*cols)
        .distinct()
        .join(log.select(*cols), cols, "left_anti")
    )


def scd2_asof_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Join each fact row to the dimension version valid at its ts:
    ``valid_from <= fact.ts AND (valid_to IS NULL OR fact.ts <
    valid_to)``. Expressed as an equi-join on the key plus the range
    predicate — Spark plans the key as the shuffle hash key, so the
    range residual evaluates within co-located partitions, never as a
    cross product."""
    d = dim.select(
        F.col(key_col).alias("_k"), *[c for c in dim.columns if c != key_col]
    )
    cond = (
        (facts[ts_col] >= d["valid_from"])
        & (d["valid_to"].isNull() | (facts[ts_col] < d["valid_to"]))
        & (facts[key_col] == d["_k"])
    )
    return facts.join(d, cond, "left").drop("_k")
