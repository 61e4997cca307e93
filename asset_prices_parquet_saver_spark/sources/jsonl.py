"""JSONL (newline-delimited JSON) corpus source/sink — the de-facto
interchange format of LLM training corpora (one document object per
line). Schema-contracted reads with a corrupt-line audit channel, and
a plain JSONL writer.

Scale shape: Spark's native JSON reader splits ndjson by line across
tasks like any text source (no whole-file parse), pushes column
pruning into the parser, and parses JVM-side — no Python in the path.
Reference analogue: none (the reference is parquet/CSV-only); S-family
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus under an explicit schema contract.

    Returns ``(good, bad)``: rows parsing cleanly under ``schema``
    (corrupt column dropped), and the audit channel — one row per
    malformed line with its raw text. PERMISSIVE mode, so one bad line
    never kills a 100 TB ingest (FAILFAST is the wrong default for
    web-scale corpora; a dropped-silently DROPMALFORMED hides data
    loss — the audit channel is the point).

    Spark gotcha handled here: since 2.3, a query referencing ONLY the
    internal corrupt-record column of a raw JSON scan is disallowed
    (the parser could not know which lines are corrupt without parsing
    the contracted columns too). The read is materialized ONCE with
    ``localCheckpoint`` before splitting, which both lifts that
    restriction and guarantees good/bad come from the SAME parse —
    re-reading for each side could double-parse the corpus and even
    disagree if files change between scans."""
    full_schema = f"{schema}, {CORRUPT_COL} string"
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .localCheckpoint()
    )
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad


def ingest_report(good: DataFrame, bad: DataFrame) -> dict:
    """Parse-quality numbers a JSONL ingest logs: row counts and the
    malformed-line rate (two count jobs over the already-materialized
    split — cheap)."""
    n_good, n_bad = good.count(), bad.count()
    total = n_good + n_bad
    return {
        "rows": n_good,
        "corrupt_lines": n_bad,
        "corrupt_rate": round(n_bad / total, 6) if total else 0.0,
    }


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a DataFrame as JSONL (Spark's json sink IS ndjson — one
    object per line, split across part files)."""
    df.write.mode(mode).json(path)
