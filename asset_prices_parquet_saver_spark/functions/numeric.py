"""Cross-engine-deterministic numeric helpers.

Why: double-precision SUM/AVG is order-dependent, and Spark's partial
aggregation order differs run-to-run and from any oracle engine. The
driver's correctness gate hashes values, so "close" is not "equal".

Fix: cast inputs to exact decimals *before* arithmetic, aggregate in
decimal (exact, order-independent), cast the final result back to double.
The same construction is mirrored literally in the oracle SQL
(``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)``), so both engines
round the same decimal to the same nearest double. The test data's
monetary columns carry ≤2 decimals, discount/tax ≤2, so DECIMAL(18,2)/
DECIMAL(8,4) casts are lossless.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Cast a double column to an exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Order-independent SUM over doubles: decimal-exact, back to double."""
    return F.sum(dec(col, precision, scale)).cast("double")


def dsum_expr(sql_expr: str, precision: int = 18, scale: int = 2) -> str:
    """Oracle-SQL mirror of :func:`dsum` for a raw SQL expression."""
    return f"CAST(SUM(CAST({sql_expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def davg(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum / count, in double.

    Mirrored in SQL as ``CAST(SUM(CAST(x AS DECIMAL)) AS DOUBLE) /
    COUNT(x)`` — a single double division of identical operands is
    bit-deterministic on both engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, precision, scale)).cast("double") / F.count(c)


def round6(col: Column | str) -> Column:
    """Round a computed double to 6 decimals (for genuinely-float results
    like cosine similarity where exactness across engines is impossible;
    1e-15-scale engine noise cannot flip a 1e-6 rounding except on a
    measure-zero boundary)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, 6)


def round6_portable(col: Column | str) -> Column:
    """6-decimal rounding built ONLY from exactly-specified IEEE-754
    operations: ``floor(x * 1e6 + 0.5) / 1e6``.

    Midpoint semantics: round-half-toward-+infinity — NOT the
    half-away-from-zero of ``F.round``/the previous DECIMAL staging.
    For positive values the two agree (half-up); for a NEGATIVE exact
    midpoint they differ by one grain: -0.0000005 → 0.0 here vs
    -0.000001 under half-away. This is a deliberate contract choice
    (the symmetric form would need sign/abs on both engines for no
    call-site benefit); both engines implement THIS form identically,
    which is the property the gate certifies. Call sites with negative
    values (returns, deltas) inherit the +inf midpoint convention.

    Why not engine ``round()``: Spark HALF_UP and DuckDB
    multiply-then-half-away disagree when the double's exact decimal
    expansion terminates in 5 at the 7th digit — possible for coarse
    dyadic values like 1/2^7 = 0.0078125, i.e. exactly the quotients of
    low-scale decimal inputs. Why not staging through DECIMAL(38,6)
    (the previous contract): double→decimal conversion is ENGINE
    LIBRARY CODE whose midpoint behavior changed between DuckDB builds
    — CORRECTNESS_r05 `daily_returns` went red against a driver DuckDB
    whose (38,6) cast rounded the same midpoint differently than the
    local build the contract was verified on.

    This form has no engine discretion anywhere: `*` and `+` are IEEE
    correctly-rounded, `floor` is exact, and the final division of an
    integer-valued double by 1000000.0 is IEEE correctly-rounded — any
    two IEEE-754 engines produce the identical bit pattern. Domain:
    |x| < 9e12 (Spark's floor yields LONG); every call site is a
    ratio/return/percentage far below that.

    SQL mirror: :func:`round6_sql` → ``FLOOR(x * 1000000.0 + 0.5) /
    1000000.0``. Use for quotients/differences of decimal-scale
    inputs; plain :func:`round6` remains fine for irrational
    statistics (stddev, corr, cosine) which cannot land on a dyadic
    midpoint.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("double") / F.lit(
        1000000.0
    )


def double_lit(x: float) -> str:
    """Render a Python float as a SQL literal that PARSES AS DOUBLE in
    DuckDB: a literal with an exponent goes through strtod (correctly
    rounded — round-trips the shortest repr bit-exactly), while a bare
    long-mantissa literal parses as DECIMAL and reaches double through
    the engine's decimal→double conversion, which for mantissas above
    2^53 is a build-dependent one-ulp hazard (the daily_returns
    lesson). Appends ``e0`` unless the repr already carries an
    exponent."""
    r = repr(float(x))
    return r if ("e" in r or "E" in r or "n" in r) else r + "e0"


def round6_sql(expr: str) -> str:
    """Oracle-SQL mirror of :func:`round6_portable` — the literally
    identical IEEE expression (DuckDB FLOOR(double) returns an
    integer-valued double; dividing it by 1000000.0 is the same
    correctly-rounded operation Spark performs on the LONG→DOUBLE
    promoted floor result)."""
    return f"FLOOR(({expr}) * 1000000.0 + 0.5) / 1000000.0"
