"""Incremental aggregate maintenance: a materialized rollup kept fresh
with O(batch) work per refresh — the "materialized view" the reference
pipeline would need once its bar store outgrows recompute-the-world.

Design (LSM-shaped, on the manifest append-log protocol):

- a refresh computes PARTIAL aggregate states for the batch only
  (per-key count + exact decimal sums — the same commutative monoid
  Spark's own partial aggregation uses) and ``commit_append``s them:
  one new segment, O(batch) regardless of rollup size;
- readers fold the partial-state log with a combinable groupBy — the
  log is one row per (key, refresh) so the fold runs over rollup-sized
  (not fact-sized) data;
- compaction folds the log back to one row per key as a snapshot
  commit, leaving readers of the old snapshot undisturbed;
- ``txn=(app_id, epoch)`` makes refreshes exactly-once under
  foreachBatch replay (the Delta txn idiom, same as the incremental
  dedup index).

The monoid is (count, sum) per measure — avg and friends derive at
read time. Min/max also combine and could join the state; quantiles
and distinct counts need sketches and are deliberately out of scope
here (see approx_user_stats for the HLL story).

Equivalence to a full recompute over all facts ever ingested is
asserted in tests/test_incremental_agg.py, including through crash
replays and interleaved compactions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.sources import manifest


def _partial_states(
    batch: DataFrame, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    aggs = [F.count("*").cast("long").alias("_cnt")]
    for c in sum_cols:
        aggs.append(F.sum(F.col(c).cast("decimal(28,2)")).alias(f"_sum_{c}"))
    return batch.groupBy(*keys).agg(*aggs)


def refresh_rollup(
    batch: DataFrame,
    table: str,
    keys: list[str],
    sum_cols: list[str],
    txn: tuple[str, int] | None = None,
) -> int:
    """Fold ``batch`` into the rollup at ``table``: aggregate the batch
    to partial states and append them as one new segment. O(batch);
    never reads or rewrites existing state. Returns the committed
    version."""
    return manifest.commit_append(_partial_states(batch, keys, sum_cols), table, txn=txn)


def read_rollup(
    spark: SparkSession,
    table: str,
    keys: list[str],
    sum_cols: list[str],
    version: int | None = None,
) -> DataFrame:
    """Resolve the rollup: fold the partial-state log to one row per
    key and derive the final measures — (n, sum_<c>, avg_<c>). The
    fold is a combinable groupBy over state-log rows (|keys| x
    #refreshes at worst), never over facts."""
    log = manifest.read_versioned(spark, table, version=version)
    folded = log.groupBy(*keys).agg(
        F.sum("_cnt").cast("long").alias("n"),
        *[F.sum(f"_sum_{c}").alias(f"_sum_{c}") for c in sum_cols],
    )
    out = folded
    for c in sum_cols:
        out = out.withColumn(f"sum_{c}", F.col(f"_sum_{c}").cast("double")).withColumn(
            f"avg_{c}", (F.col(f"_sum_{c}").cast("double") / F.col("n"))
        )
    return out.select(*keys, "n", *[x for c in sum_cols for x in (f"sum_{c}", f"avg_{c}")])


def compact_rollup(
    spark: SparkSession,
    table: str,
    keys: list[str],
    sum_cols: list[str],
) -> int:
    """Fold the whole partial-state log into one row per key and
    publish it as a snapshot commit (readers of the old snapshot are
    undisturbed; the append-log then restarts from the folded state).
    Run when segments accumulate — the LSM compaction step."""
    log = manifest.read_versioned(spark, table)
    folded = log.groupBy(*keys).agg(
        F.sum("_cnt").cast("long").alias("_cnt"),
        *[F.sum(f"_sum_{c}").alias(f"_sum_{c}") for c in sum_cols],
    )
    return manifest.commit_versioned(folded, table)


def run_streaming_rollup(
    docs_stream: DataFrame,
    table: str,
    keys: list[str],
    sum_cols: list[str],
    checkpoint_dir: str | None = None,
    available_now: bool = False,
    app_id: str = "rollup",
):
    """Keep the rollup fresh from a stream: every micro-batch folds in
    via :func:`refresh_rollup` inside ``foreachBatch``, tagged with the
    epoch so crash replays are exactly-once (the same protocol as
    run_streaming_dedup). Each epoch costs O(batch) — the rollup table
    is never read, let alone rewritten, on the ingest path."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        refresh_rollup(batch, table, keys, sum_cols, txn=(app_id, epoch_id))

    writer = docs_stream.writeStream.outputMode("append").foreachBatch(handle)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
