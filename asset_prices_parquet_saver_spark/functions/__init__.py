"""Deterministic scalar/aggregate helpers shared by operators and plans."""

from asset_prices_parquet_saver_spark.functions.numeric import (
    davg,
    dec,
    dsum,
    dsum_expr,
    round6,
)
from asset_prices_parquet_saver_spark.functions.vectors import (
    cosine_similarity,
    dot,
    norm,
    to_double_array,
)

__all__ = [
    "davg",
    "dec",
    "dsum",
    "dsum_expr",
    "round6",
    "cosine_similarity",
    "dot",
    "norm",
    "to_double_array",
]
