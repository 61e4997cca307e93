"""Columnar-format interchange (S+: ORC alongside parquet/JSONL/CSV).

The reference persists exclusively to parquet
(download_historical_price.py:429-432); a complete engine also has to
EXPORT to and INGEST from the other columnar format a lakehouse
actually encounters — ORC, which Spark supports natively (no extra
jar). Avro is NOT wired up: the spark-avro module is an external jar
this environment doesn't ship, so ``write_avro``/``read_avro`` raise a
clear error naming the missing package instead of half-working.

Scale posture: both directions are plain Spark writers/readers — the
full scan parallelism, predicate pushdown (ORC supports min/max
stripe pruning), and column pruning come from the source
implementation; nothing here touches the driver. ``roundtrip_orc``
exists for fidelity proofs: export → re-read → caller aggregates; the
gated ``orc_roundtrip_orders`` query hash-asserts the roundtrip
against DuckDB reading the ORIGINAL parquet, covering int64 / double /
string / timestamp lanes end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "zlib",
) -> None:
    """Export to ORC. ``compression`` one of zlib/snappy/lzo/none —
    zlib default matches ORC ecosystem convention (Hive default)."""
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Scan ORC. Pass ``schema`` to pin the contract (same discipline
    as the JSONL/CSV sources); otherwise footer inference applies."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def roundtrip_orc(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Export ``df`` to ORC at ``path`` and return the re-read relation
    pinned to the ORIGINAL schema — so a lossy roundtrip surfaces as a
    value difference, never as a silently widened/renamed column."""
    write_orc(df, path)
    return read_orc(spark, path, schema=df.schema)


def _no_avro(*_a, **_k):
    raise ImportError(
        "Avro support requires the external org.apache.spark:spark-avro "
        "jar (not bundled with pyspark); add it via spark.jars.packages "
        "on a cluster with network access"
    )


write_avro = _no_avro
read_avro = _no_avro
