"""Vector math over ``array<float>`` embedding columns.

All JVM-side via higher-order functions (no Python in the hot path):
``zip_with`` for elementwise product, ``aggregate`` for the fold. The
fold is sequential left-to-right, i.e. deterministic for a given array —
which keeps results reproducible across partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    """array<float> → array<double> so all math runs in f64 (matches the
    oracle, which casts to DOUBLE[] before computing)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """L2 norm of an array<double> column."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (0/0 → NULL)."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))
