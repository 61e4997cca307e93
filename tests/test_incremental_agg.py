"""Incremental rollup maintenance: equivalence to full recompute,
exactly-once refresh under crash replay, compaction invariance."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from asset_prices_parquet_saver_spark.operators import incremental_agg as ia
from asset_prices_parquet_saver_spark.sources import manifest

KEYS = ["grp"]
SUMS = ["x"]


def _batch(spark, rows):
    return spark.createDataFrame(rows, "grp string, x double")


def _full_recompute(spark, batches):
    all_rows = batches[0]
    for b in batches[1:]:
        all_rows = all_rows.unionByName(b)
    return {
        r["grp"]: (r["n"], r["sx"], r["ax"])
        for r in all_rows.groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("x").cast("decimal(28,2)")).cast("double").alias("sx"),
            (
                F.sum(F.col("x").cast("decimal(28,2)")).cast("double") / F.count("*")
            ).alias("ax"),
        )
        .collect()
    }


def _read(spark, table):
    return {
        r["grp"]: (r["n"], r["sum_x"], r["avg_x"])
        for r in ia.read_rollup(spark, table, KEYS, SUMS).collect()
    }


def test_incremental_equals_full_recompute(spark, tmp_path):
    table = str(tmp_path / "rollup")
    batches = [
        _batch(spark, [("a", 1.5), ("a", 2.5), ("b", 10.0)]),
        _batch(spark, [("a", 4.0), ("c", 7.25)]),
        _batch(spark, [("b", 0.5), ("c", 0.75), ("c", 1.0)]),
    ]
    for i, b in enumerate(batches):
        ia.refresh_rollup(b, table, KEYS, SUMS, txn=("job", i))
    assert _read(spark, table) == _full_recompute(spark, batches)


def test_refresh_is_o_batch_append(spark, tmp_path):
    table = str(tmp_path / "rollup")
    ia.refresh_rollup(_batch(spark, [("a", 1.0)]), table, KEYS, SUMS, txn=("job", 0))
    segs_before = manifest._read_manifest(table)["segments"]
    ia.refresh_rollup(_batch(spark, [("b", 2.0)]), table, KEYS, SUMS, txn=("job", 1))
    segs_after = manifest._read_manifest(table)["segments"]
    # append-log: the old segments are untouched, exactly one is added
    assert segs_after[: len(segs_before)] == segs_before
    assert len(segs_after) == len(segs_before) + 1


def test_crash_replay_does_not_double_count(spark, tmp_path):
    table = str(tmp_path / "rollup")
    b0 = _batch(spark, [("a", 1.0), ("b", 2.0)])
    ia.refresh_rollup(b0, table, KEYS, SUMS, txn=("job", 0))
    before = _read(spark, table)
    # foreachBatch replays the same epoch after a crash: must be a no-op
    ia.refresh_rollup(b0, table, KEYS, SUMS, txn=("job", 0))
    assert _read(spark, table) == before


def test_compaction_preserves_results_and_folds_segments(spark, tmp_path):
    table = str(tmp_path / "rollup")
    batches = [
        _batch(spark, [("a", 1.0), ("b", 2.0)]),
        _batch(spark, [("a", 3.0)]),
        _batch(spark, [("b", 4.0), ("c", 5.0)]),
    ]
    for i, b in enumerate(batches):
        ia.refresh_rollup(b, table, KEYS, SUMS, txn=("job", i))
    before = _read(spark, table)
    ia.compact_rollup(spark, table, KEYS, SUMS)
    assert manifest._read_manifest(table)["segments"][-1:] == manifest._read_manifest(table)["segments"]
    assert len(manifest._read_manifest(table)["segments"]) == 1
    assert _read(spark, table) == before
    # the log keeps accepting appends after compaction
    ia.refresh_rollup(_batch(spark, [("a", 10.0)]), table, KEYS, SUMS, txn=("job", 3))
    got = _read(spark, table)
    assert got["a"][0] == 3 and got["a"][1] == pytest.approx(14.0)


def test_time_travel_reads_old_rollup_state(spark, tmp_path):
    table = str(tmp_path / "rollup")
    v0 = ia.refresh_rollup(_batch(spark, [("a", 1.0)]), table, KEYS, SUMS)
    ia.refresh_rollup(_batch(spark, [("a", 9.0)]), table, KEYS, SUMS)
    old = {
        r["grp"]: r["sum_x"]
        for r in ia.read_rollup(spark, table, KEYS, SUMS, version=v0).collect()
    }
    assert old == {"a": 1.0}


def test_streaming_rollup_end_to_end(spark, tmp_path):
    table = str(tmp_path / "rollup")
    drop = tmp_path / "drop"
    drop.mkdir()
    b1 = _batch(spark, [("a", 1.0), ("b", 2.0)])
    b2 = _batch(spark, [("a", 3.0), ("c", 4.0)])
    b1.coalesce(1).write.mode("append").parquet(str(drop))
    b2.coalesce(1).write.mode("append").parquet(str(drop))

    stream = spark.readStream.schema("grp string, x double").parquet(str(drop))
    q = ia.run_streaming_rollup(
        stream,
        table,
        KEYS,
        SUMS,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    got = _read(spark, table)
    assert got["a"] == (2, 4.0, 2.0)
    assert got["b"] == (1, 2.0, 2.0)
    assert got["c"] == (1, 4.0, 4.0)
