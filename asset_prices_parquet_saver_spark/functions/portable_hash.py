"""Engine-portable 60-bit hashing (md5-derived).

The fuzzy-dedup and LSH operators default to ``xxhash64`` — the fastest
JVM-side hash — but xxhash64 has no DuckDB twin, so queries built on it
can only be rows-count-checked by the correctness gate. This module
provides a hash family every mainstream engine can reproduce bit-for-bit:

    h60(s) = int(md5(s)[:15 hex chars], 16)        ∈ [0, 2^60)

md5 hex output is identical everywhere; 15 hex chars = 60 bits keeps the
value positive in a signed 64-bit integer on engines without unsigned
types. Seeded variants use domain separation by prefixing, not integer
mixing: ``h60(str(seed) + ':' + s)`` — no multiplication, so no overflow
divergence between wrapping (Spark) and checked (DuckDB) arithmetic.

Three renderings of the same function:
  * :func:`md5_int60` — Spark Column (JVM built-ins: md5/substring/conv).
  * :func:`py_md5_int60` — Python, for Arrow-batched kernels.
  * :func:`sql_md5_int60` — ANSI-ish DuckDB SQL fragment for oracles,
    written lowest-common-denominator (strpos + shifts; no version-gated
    hex casts).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

BITS = 60
_HEX_CHARS = 15


def md5_int60(col: Column | str) -> Column:
    """Spark: first 60 bits of md5(col) as a non-negative BIGINT."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, _HEX_CHARS), 16, 10).cast("long")


def py_md5_int60(s: str) -> int:
    """Python twin of :func:`md5_int60` for mapInPandas kernels."""
    return int(hashlib.md5(s.encode()).hexdigest()[:_HEX_CHARS], 16)


def sql_hex15_int(expr: str) -> str:
    """DuckDB SQL fragment: the 15-char lowercase-hex string ``expr`` as
    a BIGINT, spelled with strpos + bit shifts only (portable across
    DuckDB versions; ``CAST('0x..' AS BIGINT)`` is newer syntax).

    ``expr`` is evaluated once per produced hex digit — feed it a
    column holding a precomputed ``substr(md5(..), 1, 15)`` rather than
    the md5 call itself, or the md5 runs 15×.

    The whole fragment is wrapped in ``CAST(.. AS BIGINT)``: DuckDB
    types ``list_sum(BIGINT[])`` as HUGEINT, and a HUGEINT output lane
    degrades to float64 under a pandas-fetching comparator (60-bit
    values exceed the 53-bit mantissa), silently corrupting the value.
    The sum of 15 4-bit limbs is < 2^60, so the cast is always exact.
    """
    return (
        "CAST(list_sum(list_transform(range(15), j -> "
        "CAST(strpos('0123456789abcdef', "
        f"substr({expr}, CAST(j+1 AS INT), 1)) - 1 AS BIGINT) "
        "<< CAST(4*(14-j) AS INT))) AS BIGINT)"
    )


def sql_md5_int60(expr: str) -> str:
    """DuckDB SQL twin of :func:`md5_int60` over the string ``expr``."""
    return sql_hex15_int(f"substr(md5({expr}), 1, 15)")
