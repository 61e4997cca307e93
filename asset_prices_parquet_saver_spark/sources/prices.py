"""The partitioned ``prices`` dataset (SURVEY §1.5, §7.1).

Replaces the reference's one-Parquet-file-per-(symbol,source) layout
(download_historical_price.py:74-82, :429, :455) with a single dataset
partitioned by ``source`` — symbol is a data column. This kills the
small-files problem at 100 TB, gives partition pruning on source, and
lets one write commit atomically (the reference hand-rolls atomicity via
tmp-file + os.replace at download_historical_price.py:429-432; Spark's
output-commit protocol plus dynamic partition overwrite provides the
same guarantee per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from asset_prices_parquet_saver_spark.schema import BAR_SCHEMA

#: fault-injection seam (tests only): runs between the staging rewrite
#: and the pre-swap drift check, i.e. inside the window where a
#: concurrent writer's update would historically have been lost.
_test_pre_swap_hook = None


def write_prices(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write bars partitioned by source, sorted by (symbol, timestamp)
    within each file so per-symbol range scans are contiguous.

    NOTE on ``mode='overwrite'`` under :func:`session.get_spark`: the
    session pins ``partitionOverwriteMode=dynamic``, so overwrite
    replaces ONLY the source partitions present in ``df`` — a rebuild
    from a frame that lacks some source leaves that source's old
    partition in place. For a true full replace, write with
    ``.option("partitionOverwriteMode", "static")`` or clear the path
    first."""
    (
        df.select([f.name for f in BAR_SCHEMA.fields])
        .repartition("source")
        .sortWithinPartitions("symbol", "timestamp")
        .write.partitionBy("source")
        .mode(mode)
        .parquet(path)
    )


def read_prices(spark: SparkSession, path: str) -> DataFrame:
    """Scan the prices dataset (source partition column recovered)."""
    return spark.read.schema(BAR_SCHEMA).parquet(path)


def write_prices_bucketed(
    df: DataFrame, table: str, num_buckets: int = 32
) -> None:
    """Warehouse-managed variant bucketed+sorted by symbol: two bucketed
    tables with matching bucketing join/aggregate on symbol without a
    shuffle — the co-location the reference got implicitly from
    one-file-per-symbol, kept at cluster scale."""
    from asset_prices_parquet_saver_spark.sources.warehouse import (
        heal_table_location,
    )

    heal_table_location(df.sparkSession, table)  # orphaned dir
    (
        df.select([f.name for f in BAR_SCHEMA.fields])
        .write.bucketBy(num_buckets, "symbol")
        .sortBy("symbol", "timestamp")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def dataset_fingerprint(path: str) -> frozenset:
    """Content identity of a plain parquet dataset for optimistic
    concurrency: the set of (relative path, size, mtime_ns) of every
    data file. Any concurrent write — new file, overwrite, delete —
    changes it. Marker files (``_SUCCESS``, dotfiles) are excluded so
    re-committed markers don't read as data drift."""
    import os

    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith((".", "_")):
                continue
            p = os.path.join(root, f)
            st = os.stat(p)
            out.append((os.path.relpath(p, path), st.st_size, st.st_mtime_ns))
    return frozenset(out)


def compact_prices(
    spark: SparkSession, path: str, max_records_per_file: int = 5_000_000
) -> None:
    """Rewrite the dataset with size-targeted files per source
    partition. The reference's layout degrades into one tiny file per
    symbol (small-files problem); a live `foreachBatch` sink degrades
    the same way over time — periodic compaction is the standing fix.

    Multi-writer safety (the manifest CAS discipline, adapted to a
    plain directory that has no conditional rename):

    * compactors serialize on an ``O_CREAT|O_EXCL`` lock file — two
      concurrent compactions would otherwise interleave their renames
      and destroy the dataset;
    * writes landing DURING the staging rewrite are detected by
      fingerprinting the live files at read time and re-verifying
      immediately before the swap — drift raises
      :class:`~..sources.manifest.CommitConflict` and leaves the
      dataset (including the concurrent write) untouched, instead of
      silently discarding it as the old single-writer protocol did.
      The unguarded window shrinks from the whole rewrite job
      (minutes) to the instant between the re-check and the first
      rename; a true zero window needs a pointer layout
      (``manifest.compact_versioned``), which is the recommendation
      for any table with concurrent writers.

    The swap itself is two renames (POSIX cannot exchange directories
    in one step), so a crash between them can leave the data ONLY
    under the ``.old`` backup; :func:`recover_compaction` — called
    here before every run — renames it back, and a stale backup from
    a crash AFTER the second rename is deleted rather than wedging
    the next compaction with ENOTEMPTY."""
    import os
    import shutil

    from asset_prices_parquet_saver_spark.sources.manifest import CommitConflict

    lock = path.rstrip("/") + ".compact.lock"
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise CommitConflict(
            f"compaction lock {lock} exists — another compaction is "
            "running (or crashed; delete the lock only after verifying "
            "its recorded pid is dead)"
        ) from None
    try:
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        recover_compaction(path)
        expect = dataset_fingerprint(path)
        df = read_prices(spark, path)
        staging = path.rstrip("/") + ".compact"
        (
            df.repartition("source")
            .sortWithinPartitions("symbol", "timestamp")
            .write.option("maxRecordsPerFile", max_records_per_file)
            .partitionBy("source")
            .mode("overwrite")
            .parquet(staging)
        )
        if _test_pre_swap_hook is not None:
            _test_pre_swap_hook()
        if dataset_fingerprint(path) != expect:
            shutil.rmtree(staging, ignore_errors=True)
            raise CommitConflict(
                f"{path}: files changed during compaction — a concurrent "
                "writer landed; the rewrite was discarded (re-run to "
                "compact the new state)"
            )
        backup = path.rstrip("/") + ".old"
        os.replace(path, backup)
        os.replace(staging, path)
        shutil.rmtree(backup, ignore_errors=True)
    finally:
        try:
            os.remove(lock)
        except OSError:
            pass


def recover_compaction(path: str) -> bool:
    """Heal a crashed :func:`compact_prices` swap. Crash windows:

    - after ``path -> .old`` but before ``.compact -> path``: the only
      copy lives in ``.old`` — rename it back (the half-written
      staging directory is discarded);
    - after the second rename but before the backup delete: ``path``
      is live and ``.old`` is a stale duplicate — delete it (leaving
      it would fail the next compaction's ``os.replace`` with
      ENOTEMPTY).

    Returns True if a restore (the first case) happened."""
    import os
    import shutil

    backup = path.rstrip("/") + ".old"
    staging = path.rstrip("/") + ".compact"
    if not os.path.exists(backup):
        return False
    if os.path.exists(path):
        shutil.rmtree(backup, ignore_errors=True)  # stale duplicate
        return False
    shutil.rmtree(staging, ignore_errors=True)  # half-written staging
    os.replace(backup, path)
    return True
