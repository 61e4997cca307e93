"""Bucketized interval (range) join.

A point-in-interval join with no equi-key is the one join family where
the naive DataFrame expression (`facts.join(intervals, ts >= start &
ts < end)`) degenerates to BroadcastNestedLoopJoin / CartesianProduct —
O(|facts| x |intervals|) compared tuples, a non-starter at 100 TB.

Scale path (the standard time-bucket decomposition, cf. interval joins
in stream processors and Spark's own DPP-less range-join problem):
pick a bucket width W; a fact belongs to exactly ONE bucket
floor(ts/W); an interval [s, e) spans the buckets
floor(s/W)..floor((e-1)/W) and is EXPLODED to one row per bucket. An
equi hash join on the bucket id then co-locates every fact with every
interval that could contain it, and the exact range predicate runs as
a residual inside the matched partitions. Each qualifying (fact,
interval) pair meets in exactly one bucket — the fact's — so no
post-join dedup is needed and the result is exactly the naive join's.

Cost model: shuffle volume is |facts| + |intervals| x spans, where
spans = avg interval length / W. Pick W near the typical interval
length: spans stays O(1) while bucket selectivity does the pruning.
Skewed buckets (everything in one hour) are ordinary hash-join skew —
AQE skew-split or salting compose on top, nothing special here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICROS = 1_000_000


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86_400,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Inner-join facts to every interval with start <= ts < end.

    ``key_cols`` (present in both inputs) tighten the equi key beyond
    the time bucket. Empty/inverted intervals (end <= start) match
    nothing and are dropped before the explode (a descending
    ``sequence`` would otherwise fan out garbage buckets).
    """
    w_us = bucket_seconds * MICROS
    key_cols = key_cols or []

    f = facts.withColumn(
        "_rj_bucket", F.floor(F.unix_micros(F.col(ts_col)) / w_us)
    )
    iv = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "_rj_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(F.col(start_col)) / w_us),
                    F.floor((F.unix_micros(F.col(end_col)) - 1) / w_us),
                )
            ),
        )
    )
    iv = iv.withColumnRenamed("_rj_bucket", "_rj_bucket_i")
    cond = (
        (f["_rj_bucket"] == iv["_rj_bucket_i"])
        & (f[ts_col] >= iv[start_col])
        & (f[ts_col] < iv[end_col])
    )
    for k in key_cols:
        cond = cond & (f[k] == iv[k])
    out = f.join(iv, cond)
    for k in key_cols:
        out = out.drop(iv[k])
    return out.drop("_rj_bucket", "_rj_bucket_i")
