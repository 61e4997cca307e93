"""Manifest-table Python DataSource WRITER (S7 as ``df.write.format``).

The reference publishes results with tmp-file + ``os.replace``
(download_historical_price.py:429-432). The engine's scale-correct sink
is the manifest commit protocol (`sources/manifest.py` — Delta/Iceberg
idea: immutable segments + one atomic metadata publish). This module
exposes that sink through Spark 4's Python DataSource writer API, so it
composes with ANY DataFrame or stream exactly like a built-in format::

    spark.dataSource.register(ManifestTableDataSource)

    df.write.format("manifest_table").mode("append").save(table_path)
    df.write.format("manifest_table").mode("overwrite").save(table_path)

    (stream.writeStream.format("manifest_table")
        .option("checkpointLocation", ckpt)
        .option("txn_app_id", "my-feed")       # exactly-once identity
        .start(table_path))

Write protocol (the DataSourceV2 / Iceberg shape):

1. Each TASK writes its partition to a staging file
   ``<table>/_staging/<writer-uuid>/part-<pid>-<uuid>.parquet`` via
   Arrow (zero row-by-row Python) and returns the path in its commit
   message. Task retries/speculation write DISTINCT uuid-named files;
   only the one path per partition that reaches the driver's commit
   is published, the rest are swept with the staging dir.
2. The DRIVER commit moves exactly the message-named files into the
   next immutable segment directory and publishes the manifest under
   the commit lock (`manifest.commit_staged_files`) — one atomic
   metadata swap commits every task's output or none of it. ``abort``
   removes the staging dir; a crashed job leaves only unreferenced
   staging files (GC'd by the next commit's sweep).

Batch ``mode("append")`` extends the segment list (the append-log
shape); ``mode("overwrite")`` publishes a full replacement snapshot.
Streaming appends one segment per micro-batch with
``txn=(txn_app_id, batchId)``, so a replayed epoch no-ops — the same
exactly-once idiom `streaming/live.py` uses via foreachBatch, now
available as a plain ``writeStream.format``. Read the table back with
``manifest.read_versioned`` (time travel, zone maps, CDC included).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

_STAGING = "_staging"


class _StagedFile(WriterCommitMessage):
    def __init__(self, path: str | None, rows: int):
        self.path = path
        self.rows = rows


def _stage_batches(staging: str, iterator) -> _StagedFile:
    """Write one task's Arrow batches to a single staged parquet file.
    Runs on the EXECUTOR; a task that receives no rows stages nothing
    (empty parquet files would still cost a footer read per scan)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark import TaskContext

    batches = [b for b in iterator if b.num_rows]
    if not batches:
        return _StagedFile(None, 0)
    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else 0
    os.makedirs(staging, exist_ok=True)
    path = os.path.join(staging, f"part-{pid:05d}-{uuid.uuid4().hex}.parquet")
    tbl = pa.Table.from_batches(batches)
    pq.write_table(tbl, path)
    return _StagedFile(path, tbl.num_rows)


class ManifestBatchWriter(DataSourceArrowWriter):
    def __init__(self, options, overwrite: bool):
        self.table = options.get("path") or options.get("table")
        if not self.table:
            raise ValueError(
                "manifest_table: supply the table path via .save(path) "
                "or .option('table', path)"
            )
        self.overwrite = overwrite
        # one staging namespace per logical write, fixed driver-side so
        # every task (and the commit) agrees on it after pickling
        self.staging = os.path.join(self.table, _STAGING, uuid.uuid4().hex)

    def write(self, iterator):
        return _stage_batches(self.staging, iterator)

    def commit(self, messages):
        from asset_prices_parquet_saver_spark.sources import manifest

        try:
            files = [m.path for m in messages if m is not None and m.path]
            manifest.commit_staged_files(
                files, self.table, append=not self.overwrite
            )
        finally:
            shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages):
        shutil.rmtree(self.staging, ignore_errors=True)


class ManifestStreamWriter(DataSourceStreamWriter):
    """One manifest append-segment per micro-batch, exactly-once via
    ``txn=(txn_app_id, batchId)`` — a restarted query replays its last
    epoch and the manifest skips it (the foreachBatch idiom of
    streaming/live.py as a declarative sink)."""

    def __init__(self, options, schema=None):
        self.table = options.get("path") or options.get("table")
        if not self.table:
            raise ValueError(
                "manifest_table: supply the table path via .start(path) "
                "or .option('table', path)"
            )
        # STABLE across restarts (applicationId is not): default keys
        # the txn to the table itself; share one feed identity across
        # queries by setting it explicitly
        self.app_id = options.get("txn_app_id") or "manifest_stream"
        self.staging = os.path.join(self.table, _STAGING, uuid.uuid4().hex)
        # the DECLARED writer schema (StructType): every staged file is
        # typed from it, never inferred from row values — a partition
        # whose column is entirely None must still stage the declared
        # type, or segment files diverge and break later manifest reads
        self.schema = schema

    def write(self, iterator):
        # rows arrive as pyspark Rows for stream writers; convert via
        # Arrow once per task (bounded by the micro-batch slice)
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        rows = list(iterator)
        if not rows:
            return _StagedFile(None, 0)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        os.makedirs(self.staging, exist_ok=True)
        path = os.path.join(
            self.staging, f"part-{pid:05d}-{uuid.uuid4().hex}.parquet"
        )
        cols = rows[0].__fields__
        arrow_schema = None
        if self.schema is not None:
            from pyspark.sql.pandas.types import to_arrow_schema

            # tz=UTC timestamp columns, matching the Arrow batches the
            # batch writer stages (naive engine datetimes ARE UTC here:
            # the session tz is pinned)
            arrow_schema = to_arrow_schema(self.schema)
        tbl = pa.table(
            {c: [r[i] for r in rows] for i, c in enumerate(cols)},
            schema=arrow_schema,
        )
        pq.write_table(tbl, path)
        return _StagedFile(path, tbl.num_rows)

    def commit(self, messages, batchId: int):
        from asset_prices_parquet_saver_spark.sources import manifest

        try:
            files = [m.path for m in messages if m is not None and m.path]
            manifest.commit_staged_files(
                files,
                self.table,
                append=True,
                txn=(self.app_id, int(batchId)),
            )
        finally:
            shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages, batchId: int):
        shutil.rmtree(self.staging, ignore_errors=True)


class ManifestTableDataSource(DataSource):
    """``format("manifest_table")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "manifest_table"

    def writer(self, schema, overwrite: bool):
        return ManifestBatchWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return ManifestStreamWriter(self.options, schema)
