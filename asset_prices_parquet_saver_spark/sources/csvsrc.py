"""CSV corpus source — the tabular sibling of :mod:`sources.jsonl`
(eval sets, metadata sidecars, and symbol lists ship as CSV): schema-
contracted reads with the same corrupt-line audit channel.

Scale shape: Spark's native CSV reader line-splits across tasks,
prunes columns in the parser, and stays JVM-side. Reference analogue:
the reference consumes API CSV/JSON payloads eagerly in pandas
(download_historical_price.py); here malformed lines are a FIRST-CLASS
output instead of an exception.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read a CSV table under an explicit schema contract.

    Returns ``(good, bad)`` — clean rows, and one audit row per
    malformed line with its raw text (PERMISSIVE mode: a bad line
    never kills the ingest, and unlike DROPMALFORMED nothing vanishes
    silently). Same single-materialization discipline as
    :func:`sources.jsonl.read_jsonl`: the corrupt-column-only query
    restriction is lifted by checkpointing ONE parse that feeds both
    sides."""
    full_schema = f"{schema}, {CORRUPT_COL} string"
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
        .localCheckpoint()
    )
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad
