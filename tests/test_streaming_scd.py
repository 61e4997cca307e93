"""Streaming SCD2 (streaming/dimensions.py): micro-batched changelog →
manifest-committed dimension, equal to the one-shot batch build over
the full log, with time travel across epochs."""

from __future__ import annotations

import datetime

from asset_prices_parquet_saver_spark.operators.scd import scd2_from_changelog
from asset_prices_parquet_saver_spark.sources import manifest
from asset_prices_parquet_saver_spark.streaming.dimensions import (
    run_streaming_scd2,
)

SCHEMA = "key string, ts timestamp, obs_id long, attr string"


def _rows(spec):
    return [
        (k, datetime.datetime(2024, 2, d), oid, a) for (k, d, oid, a) in spec
    ]


BATCH1 = _rows([("a", 1, 1, "x"), ("a", 2, 2, "x"), ("b", 1, 3, "p")])
BATCH2 = _rows([("a", 3, 4, "y"), ("c", 1, 5, "q"), ("b", 2, 6, "p")])


def _canon(df):
    return sorted(
        (r["key"], r["version"], r["attr"], r["valid_from"], r["valid_to"],
         r["is_current"])
        for r in df.collect()
    )


def test_streaming_scd2_matches_batch_build(spark, tmp_path):
    src = tmp_path / "changes"
    src.mkdir()
    dim_table = str(tmp_path / "dim")
    ck = str(tmp_path / "ck")

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        q = run_streaming_scd2(
            spark, stream, dim_table,
            "key", "ts", ["attr"], "obs_id",
            checkpoint_dir=ck, available_now=True,
        )
        q.awaitTermination(120)

    spark.createDataFrame(BATCH1, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_once()
    spark.createDataFrame(BATCH2, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_once()

    dim = manifest.read_versioned(spark, dim_table)
    full = scd2_from_changelog(
        spark.createDataFrame(BATCH1 + BATCH2, SCHEMA),
        "key", "ts", ["attr"], "obs_id",
    )
    assert _canon(dim) == _canon(full)

    # time travel: the pre-batch-2 snapshot is still readable and is
    # exactly the batch-1 build
    v_now = manifest.current_version(dim_table)
    prev = manifest.read_versioned(spark, dim_table, version=v_now - 1)
    first = scd2_from_changelog(
        spark.createDataFrame(BATCH1, SCHEMA), "key", "ts", ["attr"], "obs_id"
    )
    assert _canon(prev) == _canon(first)
