"""Skew-mitigation helpers (SURVEY §4 scale posture).

AQE's skew-join handling covers sort-merge joins at runtime, but two
hot-key patterns still need explicit treatment at 100 TB:

- heavy aggregation keys (one symbol with 10⁹ ticks): two-phase salted
  aggregation spreads the hot key across ``n_salts`` partial groups;
- hot join keys against a non-broadcastable side: replicate the small
  side per salt (:func:`salted_join` — classic salt-and-replicate).

Both are pure DataFrame programs; no RDDs, no custom partitioners.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "__salt") -> DataFrame:
    """Deterministic pseudo-random salt in [0, n_salts): derived from a
    stable row hash, not rand(), so retried tasks produce identical
    output (a requirement for exactly-once sinks)."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )


def salted_sum_count(
    df: DataFrame, keys: list[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase salted sum/count/avg over a skewed key set.

    For algebraic aggregates Spark's map-side combine already absorbs
    most skew; the explicit two-phase form matters when the reduce side
    itself is the hot spot (a single key holding a large fraction of
    all rows, so even combined partials overwhelm one reducer).

    The decimal staging (order-independent exact sums; see
    functions/numeric.py) uses scale 6, NOT 2: a 2-decimal cast would
    ROUND sub-cent inputs (vwap-style values) before summing, silently
    corrupting total/avg relative to the unsalted sum. Inputs with more
    than 6 decimals are genuinely-float — route those through a plain
    double sum and accept order-dependence, or widen the scale."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(value_col).alias("n_p"),
        F.sum(F.col(value_col).cast("decimal(38,6)")).alias("sum_p"),
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("n_p").alias("n"),
            F.sum("sum_p").cast("double").alias("total"),
        )
        .withColumn("avg", F.col("total") / F.col("n"))
    )


def two_phase_distinct_count(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Exact COUNT(DISTINCT) without funnelling a hot key's values
    through one reducer: dedupe on (keys, value) first — the shuffle
    key includes the value, so cardinality spreads — then count rows
    per key. The standard skew-safe expansion of distinct-count."""
    return (
        # drop NULL values first: COUNT(DISTINCT col) ignores NULLs,
        # but a (keys, NULL) row would survive distinct() and count('*')
        # would overcount every key holding at least one NULL by one
        df.select(*keys, value_col)
        .filter(F.col(value_col).isNotNull())
        .distinct()
        .groupBy(*keys)
        .agg(F.count("*").alias("n_distinct"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    spread_duplicates: bool = False,
) -> DataFrame:
    """Salt-and-replicate inner join for a hot key against a side too
    large to broadcast outright but small enough to replicate
    ``n_salts`` times: the big side gets a salt, the small side is
    exploded once per salt value, and the join key becomes
    (key, salt) — the hot key's rows land on n_salts reducers instead
    of one.

    The default salt hashes the full row: deterministic, so a task
    retry replays identically (required by exactly-once sinks) — but
    exact duplicate rows share one salt. For duplicate-heavy inputs
    set ``spread_duplicates=True``: the salt mixes in a per-partition
    monotonic id, spreading copies across reducers at the cost of a
    partitioning-dependent (though still retry-safe: Spark replays a
    partition's rows in order) salt assignment."""
    salt_src = (
        F.xxhash64(F.monotonically_increasing_id(), *big.columns)
        if spread_duplicates
        else F.xxhash64(*big.columns)
    )
    big_salted = big.withColumn(
        "__salt", F.pmod(salt_src, F.lit(n_salts)).cast("int")
    )
    small_replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return big_salted.join(small_replicated, [key, "__salt"]).drop("__salt")
