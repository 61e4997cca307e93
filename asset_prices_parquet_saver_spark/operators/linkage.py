"""Record linkage: blocked fuzzy matching on string keys (X4/J-family
adjunct; SURVEY §2.11). The classic entity-resolution shape — an
equi-join on cheap blocking keys bounds the candidate set, an edit-
distance predicate verifies the survivors — so cost is Σ block² over
block sizes, never corpus². Reference analogue: none (the reference's
joins are exact-key only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_edit_matches(
    df: DataFrame,
    key_col: str,
    name_col: str,
    block_exprs: dict[str, Column],
    min_dist: int = 1,
    max_dist: int = 3,
) -> DataFrame:
    """Near-duplicate name pairs under blocking: all (a, b) with a < b
    on ``key_col``, equal values for every blocking expression, and
    Levenshtein distance between the names in [min_dist, max_dist].
    ``min_dist=1`` excludes exact duplicates (those belong to the
    exact-dedup path); returns (key_a, key_b, name_a, name_b,
    edit_dist).

    Scale shape: the self-join is a plain equi-join on the blocking
    keys — Catalyst shuffles both sides by block, and the quadratic
    blow-up is confined to single blocks (the record-linkage blocking
    discipline; a skewed hot block is handled like any skewed join
    key — salt or split the block definition, see operators/skew.py).
    The distance predicate uses Spark's THRESHOLD-bounded
    ``levenshtein(l, r, k)`` (early-exits the DP once the band exceeds
    ``max_dist`` — O(k·len) per pair, not O(len²)), JVM-side inside
    whole-stage codegen; no Python touches the hot path."""
    sel = [F.col(key_col).alias("k"), F.col(name_col).alias("nm")] + [
        expr.alias(name) for name, expr in block_exprs.items()
    ]
    base = df.select(*sel)
    a = base.select(
        F.col("k").alias("key_a"),
        F.col("nm").alias("name_a"),
        *[F.col(c).alias(f"{c}_a") for c in block_exprs],
    )
    b = base.select(
        F.col("k").alias("key_b"),
        F.col("nm").alias("name_b"),
        *[F.col(c).alias(f"{c}_b") for c in block_exprs],
    )
    cond = F.col("key_a") < F.col("key_b")
    for c in block_exprs:
        cond = cond & (F.col(f"{c}_a") == F.col(f"{c}_b"))
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"), max_dist)
    return (
        a.join(b, cond)
        .withColumn("edit_dist", dist.cast("long"))
        .filter((F.col("edit_dist") >= min_dist) & (F.col("edit_dist") != -1))
        .select("key_a", "key_b", "name_a", "name_b", "edit_dist")
    )
