"""The manifest-table DataSource writer: batch append/overwrite commits
through the manifest protocol, streaming epochs exactly-once."""

import os

import pytest

from asset_prices_parquet_saver_spark.sources import manifest
from asset_prices_parquet_saver_spark.sources.manifest_datasource import (
    ManifestTableDataSource,
)

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(ManifestTableDataSource)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def _read_ids(spark, table):
    df = manifest.read_versioned(spark, table, schema="id long, v string")
    return sorted(r["id"] for r in df.collect())


def test_batch_append_and_overwrite_commits(spark, tmp_path):
    table = str(tmp_path / "t")
    _mk(spark, [(1, "a"), (2, "b")]).write.format("manifest_table").mode(
        "append"
    ).save(table)
    assert _read_ids(spark, table) == [1, 2]
    assert manifest.current_version(table) == 1

    _mk(spark, [(3, "c")]).write.format("manifest_table").mode("append").save(
        table
    )
    assert _read_ids(spark, table) == [1, 2, 3]
    assert manifest.segment_count(table) == 2  # append-log shape

    _mk(spark, [(9, "z")]).write.format("manifest_table").mode(
        "overwrite"
    ).save(table)
    assert _read_ids(spark, table) == [9]
    assert manifest.segment_count(table) == 1  # full replacement snapshot

    # staging left clean after every commit
    staged = os.path.join(table, "_staging")
    assert not os.path.exists(staged) or not any(
        files for _, _, files in os.walk(staged)
    )


def test_batch_write_multi_partition_single_commit(spark, tmp_path):
    """Every task's staged file lands in ONE segment under ONE manifest
    publish — not a version per partition."""
    table = str(tmp_path / "t")
    df = spark.range(0, 100, 1, 8).selectExpr("id", "CAST(id AS STRING) AS v")
    df.write.format("manifest_table").mode("append").save(table)
    assert manifest.current_version(table) == 1
    assert _read_ids(spark, table) == list(range(100))
    seg = os.path.join(table, "v00000001")
    parts = [f for f in os.listdir(seg) if f.endswith(".parquet")]
    assert len(parts) == 8  # one staged file per non-empty task


def test_batch_empty_write_is_noop(spark, tmp_path):
    table = str(tmp_path / "t")
    _mk(spark, [(1, "a")]).write.format("manifest_table").mode("append").save(
        table
    )
    _mk(spark, []).write.format("manifest_table").mode("append").save(table)
    # no empty segment, no version bump
    assert manifest.current_version(table) == 1
    assert _read_ids(spark, table) == [1]


def test_streaming_epochs_append_exactly_once(spark, tmp_path):
    """Each micro-batch commits one segment with txn=(app_id, batchId);
    a replayed epoch (same batchId after checkpoint rollback) no-ops."""
    table = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    _mk(spark, [(1, "a"), (2, "b")]).write.parquet(src)

    q = (
        spark.readStream.schema("id long, v string")
        .parquet(src)
        .writeStream.format("manifest_table")
        .option("checkpointLocation", ckpt)
        .option("txn_app_id", "test-feed")
        .trigger(availableNow=True)
        .start(table)
    )
    q.awaitTermination(120)
    assert _read_ids(spark, table) == [1, 2]
    v1 = manifest.current_version(table)

    # replay the SAME epoch through the txn protocol directly (the
    # datasource commit path): batchId 0 is already recorded for this
    # app id, so a staged re-commit must skip
    import pyarrow as pa
    import pyarrow.parquet as pq

    staged = str(tmp_path / "replay.parquet")
    pq.write_table(pa.table({"id": [99], "v": ["dup"]}), staged)
    out = manifest.commit_staged_files(
        [staged], table, append=True, txn=("test-feed", 0)
    )
    assert out == v1  # skipped — version unchanged
    assert _read_ids(spark, table) == [1, 2]

    # a NEW epoch commits
    pq.write_table(pa.table({"id": [3], "v": ["c"]}), staged)
    out = manifest.commit_staged_files(
        [staged], table, append=True, txn=("test-feed", 1)
    )
    assert out == v1 + 1
    assert _read_ids(spark, table) == [1, 2, 3]


def test_commit_staged_files_moves_only_named_files(tmp_path, spark):
    """Leftover staging files from failed/speculative attempts are NOT
    published — only the commit-message paths move."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = str(tmp_path / "t")
    os.makedirs(table)
    good = str(tmp_path / "good.parquet")
    orphan = str(tmp_path / "orphan.parquet")
    pq.write_table(pa.table({"id": [1], "v": ["a"]}), good)
    pq.write_table(pa.table({"id": [2], "v": ["b"]}), orphan)
    v = manifest.commit_staged_files([good], table, append=True)
    assert v == 1
    assert _read_ids(spark, table) == [1]
    assert os.path.exists(orphan)  # untouched
    assert not os.path.exists(good)  # moved, not copied


def test_streaming_all_null_column_stages_declared_type(spark, tmp_path):
    """A micro-batch partition whose column is entirely None must stage
    the DECLARED type (the writer schema), not a null-typed column —
    otherwise segment files carry divergent physical schemas and later
    manifest reads break."""
    import pyarrow.parquet as pq

    table = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    spark.createDataFrame([(1, None), (2, None)], "id long, v string").coalesce(
        1
    ).write.parquet(src)

    q = (
        spark.readStream.schema("id long, v string")
        .parquet(src)
        .writeStream.format("manifest_table")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(table)
    )
    q.awaitTermination(120)

    seg = os.path.join(table, "v00000001")
    parts = [os.path.join(seg, f) for f in os.listdir(seg) if f.endswith(".parquet")]
    assert parts
    for p in parts:
        sch = pq.read_schema(p)
        assert str(sch.field("v").type) == "string", sch  # not null-typed
        assert str(sch.field("id").type) == "int64", sch
    rows = manifest.read_versioned(spark, table, schema="id long, v string").collect()
    assert sorted(r["id"] for r in rows) == [1, 2]
    assert all(r["v"] is None for r in rows)
