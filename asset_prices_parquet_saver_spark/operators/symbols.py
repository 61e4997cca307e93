"""Symbol-universe operators (A1, J1/J2, P6, U1/U3; SURVEY §2.3-2.4, §2.7).

The reference unions symbol sets from Alpaca assets, EODHD lists, and a
CLI symbol (download_historical_price.py:180-188, 214-247), uppercases,
sorts, then skips members of txt blacklists before each fetch (:347,
:385-402, :450-452; update_live_price.py:136). Relational form: union →
upper → distinct, then broadcast left-anti joins against the status
table — the optimizer prunes known-dead work *before* the expensive
fetch stage, same idea as the reference's skip-lists (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_universe(*sources: DataFrame) -> DataFrame:
    """A1/U1: distinct union of uppercased symbols from many sources."""
    out = None
    for src in sources:
        cur = src.select(F.upper(F.col("symbol")).alias("symbol"))
        out = cur if out is None else out.unionByName(cur)
    if out is None:
        raise ValueError("at least one source required")
    return out.distinct()


def tradable_only(assets: DataFrame) -> DataFrame:
    """P6: the reference keeps only tradable assets
    (update_live_price.py:98)."""
    return assets.filter(F.col("tradable"))


def exclude_status(
    symbols: DataFrame,
    status: DataFrame,
    source: str,
    statuses: tuple[str, ...] = ("invalid", "no_data"),
) -> DataFrame:
    """J1/J2: anti-join the blacklist. The right side is tiny → broadcast,
    so no shuffle of the (potentially huge) symbol side."""
    bad = status.filter(
        (F.col("source") == source) & F.col("status").isin(*statuses)
    ).select("symbol")
    return symbols.join(F.broadcast(bad), "symbol", "left_anti")


#: Conventional market-cap buckets, largest first (USD).  The reference
#: resolves categories through an external get_market_cap module
#: (download_historical_price.py:223-243, module import at :31-40);
#: the thresholds themselves are the standard public convention.
MARKET_CAP_BUCKETS: tuple[tuple[str, float], ...] = (
    ("mega", 2e11),
    ("large", 1e10),
    ("mid", 2e9),
    ("small", 3e8),
    ("micro", 5e7),
)
_SMALLEST_BUCKET = "nano"


def categorize_market_caps(
    caps: DataFrame,
    cap_col: str = "market_cap",
    buckets: tuple[tuple[str, float], ...] = MARKET_CAP_BUCKETS,
) -> DataFrame:
    """Append a ``category`` column from a descending CASE chain over
    ``cap_col`` (mirrors categorize_market_caps in the reference's
    external module; NULL caps get NULL category)."""
    expr = None
    for name, floor_ in buckets:
        cond = F.col(cap_col) >= F.lit(floor_)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.when(F.col(cap_col).isNotNull(), _SMALLEST_BUCKET)
    return caps.withColumn("category", expr)


def universe_by_categories(
    caps: DataFrame,
    categories: list[str],
    symbol_col: str = "symbol",
    cap_col: str = "market_cap",
    buckets: tuple[tuple[str, float], ...] = MARKET_CAP_BUCKETS,
) -> DataFrame:
    """The ``--categories`` pathway (download_historical_price.py:223-243):
    symbols whose market-cap bucket is in ``categories`` ('all' selects
    every bucket). Output: distinct uppercased symbols."""
    cat = categorize_market_caps(caps, cap_col, buckets)
    if "all" not in {c.lower() for c in categories}:
        cat = cat.filter(F.col("category").isin(*[c.lower() for c in categories]))
    return cat.select(F.upper(F.col(symbol_col)).alias("symbol")).distinct()


def parse_invalid_symbols(msg_col_df: DataFrame, msg_col: str = "message") -> DataFrame:
    """P16/T4: parse an Alpaca 400-error message like
    ``"...invalid symbols: A, B"`` into one row per symbol
    (update_live_price.py:170-179)."""
    return (
        msg_col_df.select(
            F.explode(
                F.split(F.regexp_extract(F.col(msg_col), r":([^:]*)$", 1), r",\s*")
            ).alias("symbol")
        )
        .select(F.upper(F.trim(F.col("symbol"))).alias("symbol"))
        .filter(F.col("symbol") != "")
    )
