"""Nearest-timestamp (as-of) join: for each left row, the latest right
row with ``right_ts <= left_ts`` in the same key group.

Reference parity: update_live_price.py keeps "the latest price at or
before now" per symbol when merging live ticks into daily bars
(update_live_price.py:142-156 keeps the last tick per day); the general
operator — align a probe stream against the most recent bar of a
*second* table — is the natural extension SURVEY §2.3 flags.

Spark-first design (the 100 TB shape): instead of a per-row range probe
or an exploded inequality join, tag both inputs, union them, and run ONE
hash-partitioned window over ``(keys...)`` ordered by ``(ts, side)``
with a carry-forward ``last(..., ignorenulls=True)``.  Cost is a single
shuffle of |left| + |right| rows on the join keys — no range cross
product, no per-key skew amplification beyond the key's own row count,
and Catalyst keeps the whole pipeline in WholeStageCodegen.  DuckDB's
``ASOF JOIN`` (the oracle) implements the same semantics with a sorted
merge; at equal timestamps the right row is eligible (``>=`` inclusive),
which the union ordering encodes by sorting right-side rows first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"  # 0 = right (bars), 1 = left (probes): right sorts first


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join.

    Returns every ``left`` row plus, for each name in ``value_cols`` and
    the matched ``right_ts`` (as ``asof_ts``), the values of the latest
    ``right`` row with ``right_ts <= left_ts`` for the same ``keys`` —
    NULL when no prior right row exists (left-join semantics).

    ``right`` must be unique per ``(keys, right_ts)`` — aggregate bars
    before joining — so the carried value is deterministic. Right rows
    with a NULL ``right_ts`` never match (an as-of comparison against
    NULL is never true, matching DuckDB ASOF JOIN).

    The matched right row is carried as ONE struct, not per-column:
    independent ``last(col, ignorenulls=True)`` per value column would
    pull each column from a DIFFERENT right row whenever the matched
    row holds a NULL (e.g. a bar with volume=NULL would hand the probe
    the PREVIOUS bar's volume under the matched bar's asof_ts — a row
    that never existed). The struct is non-null exactly on right rows,
    so ignore-nulls carries the matched row atomically, NULL fields
    included.

    ``tolerance`` (optional): a SQL interval body like ``'2 days'`` —
    the pandas ``merge_asof(tolerance=...)`` staleness cap. A matched
    bar older than ``left_ts − tolerance`` is discarded (all carried
    columns null out ATOMICALLY, same struct discipline), so a probe
    never silently reads a stale price. Applied as a post-projection on
    the carried struct — the plan shape (one union + one window, single
    shuffle) is unchanged.
    """
    keys = list(keys)
    value_cols = list(value_cols)
    left_payload = [c for c in left.columns if c not in keys and c != left_ts]
    reserved = {"asof_ts", "__ts", "__bar", _SIDE, *value_cols}
    clash = sorted(reserved & set(left_payload))
    if clash:
        raise ValueError(
            f"asof_join: left payload columns {clash} collide with the "
            "carried output columns — rename them before joining"
        )

    bar = F.struct(
        F.col(right_ts).alias("asof_ts"), *[F.col(c) for c in value_cols]
    )
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).alias("__ts"),
        bar.alias("__bar"),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
    )
    null_bar_type = r.schema["__bar"].dataType
    l = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(null_bar_type).alias("__bar"),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left_payload],
    )

    # Right rows at the same timestamp sort before left rows (inclusive
    # `>=` as-of); _SIDE completes the tie-break only between the two
    # sides — right is pre-aggregated unique per (keys, ts).
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "__bar", F.last("__bar", ignorenulls=True).over(w)
    )
    if tolerance is not None:
        # NULL asof_ts (no prior bar) stays NULL: `>=` against NULL is
        # NULL, and F.when(NULL, ...) yields NULL — left-join semantics
        # preserved without a special case
        fresh = F.col("__bar").getField("asof_ts") >= F.col("__ts") - F.expr(
            f"INTERVAL {tolerance}"
        )
        carried = carried.withColumn("__bar", F.when(fresh, F.col("__bar")))

    return carried.filter(F.col(_SIDE) == 1).select(
        *keys,
        F.col("__ts").alias(left_ts),
        *left_payload,
        F.col("__bar").getField("asof_ts").alias("asof_ts"),
        *[F.col("__bar").getField(c).alias(c) for c in value_cols],
    )
