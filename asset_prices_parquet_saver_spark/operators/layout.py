"""Z-order (Morton-curve) clustering layout: multi-dimensional data
skipping for the 100 TB scan path.

Min/max pruning on a parquet store only skips files for predicates on
the column the data happens to be sorted by. Interleaving the bits of
two filter columns into one Morton key and range-partitioning + sorting
the write on that key gives every file a bounded bounding-box in BOTH
dimensions, so a selective predicate on either column (or both) prunes
most files — the Delta/Iceberg OPTIMIZE ZORDER technique, built here
from plain Spark primitives:

- ``z_value`` is pure JVM bit arithmetic (shift/and/sum — whole-stage
  codegen, no UDF);
- ``write_zordered`` is ``repartitionByRange`` on the key (sampled
  range bounds — no global sort barrier beyond Spark's reservoir
  sample) + ``sortWithinPartitions``, so the layout job is one
  exchange at any scale;
- ``zorder_sql`` emits the same key in portable SQL so the layout is
  oracle-checkable bit-for-bit.

The curve quality claim is testable locally: with ``bits=8`` every
aligned 256-key block of the curve covers a 16x16 tile of the (a, b)
grid, so per-file min/max ranges are provably bounded — asserted in
``tests/test_layout.py`` on real footer statistics.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(a: Column, b: Column, bits: int = 8) -> Column:
    """Morton key of two non-negative ints, each masked to ``bits``
    bits: bit i of ``a`` lands at position 2i, bit i of ``b`` at
    2i + 1. Pure shift/and/add — codegen-friendly, engine-portable.

    ``2*bits`` must fit a signed long: bits > 31 would place a bit at
    position >= 63 and the key literal 1 << 63 overflows LongType (or,
    on wrapping engines, flips the key negative and destroys the
    range-partition ordering the locality guarantee rests on)."""
    if 2 * bits > 63:
        raise ValueError(
            f"z_value: 2*bits = {2 * bits} exceeds the 63 usable bits of a "
            "signed 64-bit Morton key (bits <= 31)"
        )
    a = a.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    b = b.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    parts = []
    for i in range(bits):
        parts.append(F.shiftright(a, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
        parts.append(F.shiftright(b, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1)))
    return reduce(lambda x, y: x + y, parts).cast("long")


def zorder_sql(a_sql: str, b_sql: str, bits: int = 8) -> str:
    """The same Morton key as ``z_value`` in portable SQL (DuckDB and
    ANSI engines with >> and & on BIGINT)."""
    if 2 * bits > 63:
        raise ValueError("zorder_sql: 2*bits > 63 (see z_value)")
    mask = (1 << bits) - 1
    a = f"(CAST({a_sql} AS BIGINT) & {mask})"
    b = f"(CAST({b_sql} AS BIGINT) & {mask})"
    parts = []
    for i in range(bits):
        parts.append(f"((({a} >> {i}) & 1) * {1 << (2 * i)})")
        parts.append(f"((({b} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(parts) + ")"


def zorder_locality(
    df: DataFrame,
    a_col: str,
    b_col: str,
    bits: int = 8,
    block_shift: int = 8,
) -> DataFrame:
    """Per-curve-block locality report: bucket rows by the high bits of
    their Morton key and report each block's (a, b) bounding box. With
    ``block_shift = bits`` each block is an aligned 2^(bits/2) x
    2^(bits/2) tile, so ``a_max - a_min`` and ``b_max - b_min`` are
    bounded by the tile side — the file-skipping guarantee, stated as
    a query. One map-side-combinable shuffle on the block id."""
    a = F.col(a_col).cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    b = F.col(b_col).cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    z = z_value(F.col(a_col), F.col(b_col), bits)
    return (
        df.select(
            F.shiftright(z, block_shift).alias("block"),
            a.alias("_a"),
            b.alias("_b"),
        )
        .groupBy("block")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("_a").alias("a_min"),
            F.max("_a").alias("a_max"),
            F.min("_b").alias("b_min"),
            F.max("_b").alias("b_max"),
        )
    )


def write_zordered(
    df: DataFrame,
    path: str,
    a_col: str,
    b_col: str,
    bits: int = 8,
    num_files: int = 16,
) -> None:
    """Write ``df`` clustered on the Morton key of (a_col, b_col):
    range-partition on the key (reservoir-sampled bounds — no global
    sort), sort within each partition, drop the key. Each output file
    covers a contiguous curve segment, hence a bounded (a, b) bounding
    box that parquet footer min/max stats expose to any reader."""
    keyed = df.withColumn("_z", z_value(F.col(a_col), F.col(b_col), bits))
    (
        keyed.repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def z_value_n(cols: list[Column], bits: int = 8) -> Column:
    """N-dimensional Morton key: bit i of column j lands at position
    i * n_cols + j (round-robin interleave; for two columns this is
    exactly :func:`z_value`). Same pure shift/and/add construction —
    codegen-friendly. ``n_cols * bits`` must stay within the 63 usable
    bits of a signed long (see z_value)."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"z_value_n: {n} cols x {bits} bits = {n * bits} exceeds the 63 "
            "usable bits of a signed 64-bit Morton key"
        )
    masked = [c.cast("long").bitwiseAND(F.lit((1 << bits) - 1)) for c in cols]
    parts = []
    for i in range(bits):
        for j, c in enumerate(masked):
            parts.append(
                F.shiftright(c, i).bitwiseAND(F.lit(1)) * F.lit(1 << (i * n + j))
            )
    return reduce(lambda x, y: x + y, parts).cast("long")


def zorder_sql_n(col_sqls: list[str], bits: int = 8) -> str:
    """Portable-SQL twin of :func:`z_value_n`."""
    n = len(col_sqls)
    if n * bits > 63:
        raise ValueError("zorder_sql_n: n_cols*bits > 63 (see z_value_n)")
    mask = (1 << bits) - 1
    masked = [f"(CAST({c} AS BIGINT) & {mask})" for c in col_sqls]
    parts = []
    for i in range(bits):
        for j, c in enumerate(masked):
            parts.append(f"((({c} >> {i}) & 1) * {1 << (i * n + j)})")
    return "(" + " + ".join(parts) + ")"
