"""Manifest-pointer table commits (S7 at object-store scale).

The reference's atomicity idiom is tmp-file + rename
(download_historical_price.py:429-432, update_live_price.py:288-293).
Directory renames don't exist on object stores, so the scale-correct
generalization is the Delta/Iceberg commit protocol: snapshots are
immutable directories, and the COMMIT is the atomic publish of one tiny
metadata file naming the live snapshot.

Layout::

    <table>/_MANIFEST        one-line JSON {"version": N}
    <table>/v0000000N/       immutable parquet snapshot N

Properties:
  * Executors write each new snapshot directly to its final immutable
    path — no directory rename, no window where the table is missing,
    and the previous snapshot's files are never touched while a lazy
    plan may still be reading them.
  * A writer crash leaves an orphan snapshot directory and the old
    manifest: readers never observe a torn table; the next commit
    numbers past the orphan and garbage-collects it.
  * The only atomicity primitive required is single-object publish —
    here tmp-file + ``os.replace`` (POSIX-atomic); against S3/GCS the
    same call site becomes a conditional PUT (if-match on the read
    manifest generation), which also turns concurrent committers into
    first-writer-wins instead of lost-update.

Legacy migration: a plain parquet directory (no ``_MANIFEST``) reads
as-is; its first versioned commit snapshots the merge result and then
removes the loose root data files.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST"
_KEEP_PREVIOUS = 1  # snapshots retained behind the live one (in-flight readers)


def _manifest_path(table: str) -> str:
    return os.path.join(table, MANIFEST)


def _version_dir(table: str, version: int) -> str:
    return os.path.join(table, f"v{version:08d}")


def current_version(table: str) -> int | None:
    """The committed snapshot number, or None (legacy/empty table)."""
    try:
        with open(_manifest_path(table)) as fh:
            return int(json.load(fh)["version"])
    except (FileNotFoundError, NotADirectoryError):
        return None


def _all_version_dirs(table: str) -> list[int]:
    try:
        names = os.listdir(table)
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        if n.startswith("v") and n[1:].isdigit() and os.path.isdir(os.path.join(table, n)):
            out.append(int(n[1:]))
    return sorted(out)


def _legacy_files(table: str) -> list[str]:
    """Loose pre-manifest data files, including Hive-partitioned
    (``key=value``) subdirectories — everything except snapshot dirs."""
    out: list[str] = []
    for root, dirs, files in os.walk(table):
        if root == table:
            dirs[:] = [d for d in dirs if not (d.startswith("v") and d[1:].isdigit())]
        out.extend(
            os.path.join(root, f) for f in files if f.endswith(".parquet")
        )
    return sorted(out)


def read_versioned(spark: SparkSession, table: str, schema=None) -> DataFrame:
    """Resolve the manifest and scan the live snapshot. Falls back to
    the loose root files for a legacy (pre-manifest) directory, and to
    an empty DataFrame (``schema`` required) when nothing exists."""
    v = current_version(table)
    if v is not None:
        reader = spark.read.schema(schema) if schema is not None else spark.read
        return reader.parquet(_version_dir(table, v))
    files = _legacy_files(table)
    if files:
        # pin the exact legacy files: scanning the directory itself
        # could re-list mid-job and see the in-progress v1 snapshot;
        # basePath recovers Hive partition columns from the paths
        reader = spark.read.option("basePath", table)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(*files)
    if schema is None:
        raise FileNotFoundError(f"no manifest, data, or schema for {table}")
    return spark.createDataFrame([], schema)


def commit_versioned(df: DataFrame, table: str, keep: int = _KEEP_PREVIOUS) -> int:
    """Write ``df`` as the next immutable snapshot and atomically
    publish it. Returns the committed version number.

    The new number is one past everything on disk — committed OR orphan
    — so a crashed writer's leftovers are never reused. GC (post-
    publish, best-effort) drops snapshots older than ``keep`` behind
    the new one, orphans above the old manifest, and legacy root files
    superseded by the first versioned commit."""
    os.makedirs(table, exist_ok=True)
    committed = current_version(table)
    seen = _all_version_dirs(table)
    new_v = max([committed or 0, *seen, 0]) + 1
    # the snapshot lands directly at its final, never-reused path; the
    # source-of-truth for readers is still the old manifest until the
    # publish below, so a failure anywhere in this write is invisible
    df.write.mode("overwrite").parquet(_version_dir(table, new_v))
    tmp = _manifest_path(table) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"version": new_v}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, _manifest_path(table))  # conditional PUT on S3/GCS
    # ---- post-publish GC (best-effort; failures leave only garbage) --
    for v in _all_version_dirs(table):
        is_live = v == new_v
        is_kept_history = committed is not None and committed - keep < v <= committed
        if not is_live and not is_kept_history:
            shutil.rmtree(_version_dir(table, v), ignore_errors=True)
    # legacy sweep: once a manifest exists, everything in the table dir
    # that is neither a snapshot nor the manifest is superseded data
    # (loose part files, Hive partition dirs, _SUCCESS markers)
    for n in os.listdir(table):
        if n == MANIFEST or n.startswith(MANIFEST + "."):
            continue
        if n.startswith("v") and n[1:].isdigit():
            continue
        p = os.path.join(table, n)
        try:
            shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
        except OSError:
            pass
    return new_v


def compact_versioned(
    spark: SparkSession, table: str, num_files: int = 1, schema=None
) -> int:
    """O3-style maintenance: rewrite the live snapshot into ``num_files``
    files as a new commit — readers of the old snapshot are undisturbed
    (its files are immutable), and the swap is the manifest publish."""
    cur = read_versioned(spark, table, schema=schema)
    return commit_versioned(cur.coalesce(num_files), table)
