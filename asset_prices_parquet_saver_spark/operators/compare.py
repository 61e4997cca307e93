"""Dataset comparison (J6; SURVEY §2.3, §3.3).

The reference's ``compare_parquet.py`` diffs only *metadata* between the
Alpaca and yfinance files for a symbol (columns :52, index names :59,
index types :66, dtypes :76-99) and leaves "compare sample data" as a
TODO (:101-102). We provide both:

- :func:`schema_diff` — the metadata diff, driver-side (schemas are tiny).
- :func:`data_diff` — the TODO made real: a full-outer join on key
  columns with per-column mismatch detection, fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def schema_diff(df1: DataFrame, df2: DataFrame) -> dict[str, list]:
    """Column/type differences between two frames (metadata only)."""
    t1 = {f.name: f.dataType.simpleString() for f in df1.schema.fields}
    t2 = {f.name: f.dataType.simpleString() for f in df2.schema.fields}
    return {
        "only_in_left": sorted(set(t1) - set(t2)),
        "only_in_right": sorted(set(t2) - set(t1)),
        "type_mismatch": sorted(
            (c, t1[c], t2[c]) for c in set(t1) & set(t2) if t1[c] != t2[c]
        ),
    }


def data_diff(
    df1: DataFrame,
    df2: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff: full-outer join on ``keys``; emit rows where any
    compared column differs (NULL-safe) or the row exists on one side
    only. Output: keys, then ``<col>_left``/``<col>_right`` pairs and a
    ``diff_kind`` in {'left_only','right_only','mismatch'}.
    """
    if compare_cols is None:
        compare_cols = [c for c in df1.columns if c in df2.columns and c not in keys]
    # presence detection needs a column that is never NULL on its side:
    l_marked = df1.withColumn("__l", F.lit(1)).alias("l")
    r_marked = df2.withColumn("__r", F.lit(1)).alias("r")
    joined = l_marked.join(r_marked, keys, "full_outer")

    mismatch = None
    for c in compare_cols:
        ne = ~F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
        mismatch = ne if mismatch is None else (mismatch | ne)

    kind = (
        F.when(F.col("__r").isNull(), F.lit("left_only"))
        .when(F.col("__l").isNull(), F.lit("right_only"))
        .otherwise(F.lit("mismatch"))
    )
    out = joined.select(
        *[F.col(k) for k in keys],
        *[F.col(f"l.{c}").alias(f"{c}_left") for c in compare_cols],
        *[F.col(f"r.{c}").alias(f"{c}_right") for c in compare_cols],
        kind.alias("diff_kind"),
    )
    cond = F.col("diff_kind") != "mismatch"
    if mismatch is not None:
        cond = cond | mismatch
    return out.filter(cond)


def fk_report(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    relationship: str,
) -> DataFrame:
    """Referential-integrity profile of one child→parent relationship
    (J6 extension — the cross-table half of the data-quality report;
    the reference only ever validates one file at a time,
    compare_parquet.py:52-99).

    One row: child_rows, distinct child keys, orphan child rows (key
    has no parent — NULL keys count as orphans: they reference
    nothing), unreferenced parent keys (parent never used).

    Scale: the child is reduced to (key, count) FIRST, so both
    integrity anti-joins run on the distinct-key relations — the
    shuffle is keyed on the FK on both sides and the join inputs are
    |keys|, not |rows|; AQE broadcasts whichever key set is small.

    All four counters come from ONE full-outer join of the key
    relations followed by ONE global aggregation: a key missing on the
    parent side is an orphan, missing on the child side is
    unreferenced, and the child totals fall out of the same pass.
    NULL child keys never equi-match, so they count as orphans (they
    reference nothing), exactly as the anti-join formulation did.
    This replaced a three-aggregation + two-anti-join shape (r12): the
    values are identical (hash-certified by the gate oracle), but the
    plan has one join exchange instead of two anti-joins, three
    aggregations and two cross-joins — and needs no
    localCheckpoint barrier, since each key relation is consumed
    exactly once.
    """
    ck = (
        child.select(F.col(child_key).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pk = (
        parent.select(F.col(parent_key).alias("k"))
        .distinct()
        .withColumn("__p", F.lit(True))
    )
    joined = ck.join(pk, "k", "full_outer")
    return joined.agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("__child_rows"),
        F.count(F.col("n")).alias("__child_keys"),
        F.coalesce(
            F.sum(F.when(F.col("__p").isNull(), F.col("n"))), F.lit(0)
        ).alias("__orphans"),
        F.count(F.when(F.col("n").isNull() & F.col("__p").isNotNull(), 1))
        .alias("__unref"),
    ).select(
        F.lit(relationship).alias("relationship"),
        F.col("__child_rows").cast("long").alias("child_rows"),
        F.col("__child_keys").cast("long").alias("child_keys"),
        F.col("__orphans").cast("long").alias("orphan_child_rows"),
        F.col("__unref").cast("long").alias("unreferenced_parents"),
    )
