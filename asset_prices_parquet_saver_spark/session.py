"""SparkSession factory.

Pins the settings every other module assumes:

- ``spark.sql.session.timeZone=UTC`` — the reference normalizes every
  timestamp to tz-aware UTC (download_historical_price.py:508-513,
  update_live_price.py:239-242); we store UTC and pin the session tz so
  DuckDB-oracle comparisons see identical naive datetimes.
- AQE on (runtime coalesce + skew-join) — the scale posture for 100 TB.
- Arrow on — every Pandas-UDF boundary is Arrow-batched.
- shuffle partitions sized to the local core count, not the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "asset-prices-parquet-saver-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the canonical session.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or ``*``.
    On a real cluster the same configs apply unchanged; only ``master``
    comes from the environment instead.
    """
    # Python workers run one task each and inherit this env; without it
    # every numpy matmul in a Pandas UDF spawns a full BLAS thread pool
    # (32 tasks × 32 BLAS threads thrash the box and timings go bimodal).
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*")
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE") or (cpus if cpus != "*" else "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Runtime bloom-filter pruning: on a selective fact⨝fact join
        # (too big to broadcast) the filter built from the small side's
        # join keys prunes the big side's scan — the 100 TB analogue of
        # the reference's skip-list pruning before the expensive fetch.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # 8g, MEASURED: a 16g heap (tried when the unchunked Arrow text
        # kernels OOMed the sf1 bench block) slowed the shuffle-heavy
        # giants >2x — jaccard_near_dup_pairs at sf1 ran 29 s under 8g
        # vs 63-72 s under 16g, same minute, same code (GC regime on a
        # single 32-thread JVM). The real OOM fix is output chunking
        # (functions/pandas_ops.chunked) capping per-batch Arrow
        # footprint; the heap stays small so collections stay short.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # RocksDB state store: stateful streaming state (session windows,
        # applyInPandasWithState, dedupe watermarks) lives on disk with a
        # bounded block cache instead of in executor heap — the default
        # HDFSBackedStateStore keeps every version of every key in
        # memory, which a long-running 100 TB stream outgrows. Changelog
        # checkpointing keeps per-batch commits incremental.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing"
            ".enabled",
            "true",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
