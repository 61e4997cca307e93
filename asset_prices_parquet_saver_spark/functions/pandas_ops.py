"""Pandas-UDF surface (SURVEY §2.10): the reference needs no UDFs, but
the engine exposes the full Arrow-batched escape hatch for operators
built-ins can't express. Each op here is deliberately *also* SQL-
expressible so the DuckDB oracle hash-checks the UDF plumbing itself
(schemas, grouping, Arrow round-trip), not just row counts.

Float discipline: anything crossing the Arrow boundary is rounded to 6
decimals on both engines (same policy as cosine; see plans/queries.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_per_group(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-group z-score normalization
    (the canonical grouped-map example — one pandas frame per group,
    vectorized numpy math inside). Groups with a single row or zero
    variance yield NULL. The output schema carries the INPUT types of
    the id/group columns (a hardcoded "long, string" only worked for
    the one column-type combination the first caller used)."""
    id_t = df.schema[id_col].dataType.simpleString()
    grp_t = df.schema[group_col].dataType.simpleString()
    out_schema = f"{id_col} {id_t}, {group_col} {grp_t}, z double"

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        sd = v.std(ddof=1)
        if pd.isna(sd) or sd == 0:
            z = pd.Series([None] * len(pdf), dtype="float64")
        else:
            z = ((v - v.mean()) / sd).round(6)
        return pd.DataFrame(
            {id_col: pdf[id_col], group_col: pdf[group_col], "z": z}
        )

    return df.groupBy(group_col).applyInPandas(normalize, out_schema)


def weighted_mean_per_group(
    df: DataFrame, group_col: str, value_col: str, weight_col: str
) -> DataFrame:
    """Grouped-agg ``pandas_udf``: weighted mean per group — the
    Arrow-batched aggregate path (series in, scalar out).

    NULL discipline mirrors the SQL twin ``SUM(v*w)/SUM(w)`` exactly:
    an all-NULL value group yields NULL (a bare skipna sum would turn
    it into 0.0 — a wrong answer that LOOKS like a real mean), and a
    NULL or zero weight total yields NULL (DuckDB double division by
    zero is NULL, not inf)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wmean(v: pd.Series, w: pd.Series) -> float | None:
        num = (v * w).sum(min_count=1)
        den = w.sum(min_count=1)
        if pd.isna(num) or pd.isna(den) or den == 0:
            return None
        return float(num / den)

    return df.groupBy(group_col).agg(
        F.round(wmean(F.col(value_col), F.col(weight_col)), 6).alias("wmean")
    )


def spread(df: DataFrame, par: int | None = None) -> DataFrame:
    """Round-robin repartition to full core parallelism — but ONLY when
    the input is narrower than the core count (a small parquet scan
    arrives in 1-3 partitions and would serialize an Arrow kernel on as
    many cores). A corpus-scale input is already wide, and the old
    unconditional ``repartition(par)`` would shuffle the ENTIRE payload
    (text/vector bytes, plus the sort-before-repartition pass) to fix
    parallelism it already had — guide §2.3: don't move heavy bytes for
    free parallelism. Shared by every mapInPandas kernel entry point."""
    par = par or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def chunked(frame, max_rows: int = 65536):
    """Yield a kernel's output pandas frame in row slices.

    ``mapInPandas`` serializes each yielded frame as ONE Arrow record
    batch allocated whole in executor memory — a 10k-document input
    batch that fans out to ~1M gram/posting rows would otherwise spike
    the heap per task (measured: Java heap OOM in the sf1 bench block
    under 32 concurrent tasks after the text kernels started emitting
    fan-out relations). Slicing caps the per-batch footprint without
    changing the emitted rows."""
    for i in range(0, len(frame), max_rows):
        yield frame.iloc[i : i + max_rows]
