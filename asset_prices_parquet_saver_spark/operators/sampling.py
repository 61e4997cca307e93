"""Deterministic stratified sampling (training-data splits).

``DataFrame.sampleBy`` draws from an engine-specific seeded RNG: the
selected rows change across engines, Spark versions, and partitionings,
so a sampled dataset can never be re-derived or audited. For
training-data pipelines the standard practice is *hash bucketing*:
a row is in the f-sample iff ``hash(key) / 2^32 < f``. The sample is

- deterministic: same rows on every engine/run/partitioning,
- stable under appends: existing rows never flip in or out,
- uniform: md5 output bits are uniform in the key,
- cross-engine verifiable: md5 is bit-identical everywhere, so an
  oracle SQL reproduces the exact row set (not just its size).

The predicate compares the first 8 lowercase-hex chars of
``md5(key)`` lexicographically against ``hex(floor(f·2^32))`` — for
fixed-width lowercase hex, string order IS numeric order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket_hex(key: Column, width: int = 8) -> Column:
    """First ``width`` hex chars of md5(key-as-string)."""
    return F.substring(F.md5(key.cast("string")), 1, width)


def fraction_threshold_hex(fraction: float, width: int = 8) -> str:
    """``hex(floor(f·16^width))`` zero-padded to ``width`` chars."""
    return format(int(fraction * (16**width)), "x").zfill(width)


def stratified_sample(
    df: DataFrame, strata_col: str, key_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Keep a deterministic ``fractions[stratum]`` share of each stratum
    (strata absent from ``fractions`` are dropped, like ``sampleBy``)."""
    h = hash_bucket_hex(F.col(key_col))
    pred = F.lit(False)
    for stratum, frac in fractions.items():
        in_stratum = F.col(strata_col) == stratum
        if frac >= 1.0:
            pred = pred | in_stratum
        else:
            pred = pred | (in_stratum & (h < fraction_threshold_hex(frac)))
    return df.filter(pred)


def sample_oracle_predicate(
    strata_col: str, key_col: str, fractions: dict[str, float]
) -> str:
    """The WHERE clause mirroring :func:`stratified_sample` in ANSI SQL
    (DuckDB's md5() matches Spark's bit for bit)."""
    clauses = []
    for stratum, frac in fractions.items():
        if frac >= 1.0:
            clauses.append(f"{strata_col} = '{stratum}'")
        else:
            thr = fraction_threshold_hex(frac)
            clauses.append(
                f"({strata_col} = '{stratum}' AND "
                f"substring(md5(CAST({key_col} AS VARCHAR)), 1, 8) < '{thr}')"
            )
    return " OR ".join(clauses)
