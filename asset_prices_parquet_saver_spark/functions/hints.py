"""Scale-gated broadcast hints (SURVEY §4 scale posture).

The engine's dimension relations split into two classes:

- **bounded**: ``region`` (5 rows), ``nation`` (25 rows), single- or
  few-row aggregates (global max / total / count), and query/probe
  tables. Their cardinality is a constant of the SCHEMA, independent of
  scale factor — broadcasting them is correct at any data volume, so
  they keep an explicit hint via :func:`bounded_broadcast`.

- **sf-scaling**: ``customer`` / ``supplier`` / ``part`` and any
  constant-fraction slice of them (a market segment, a name pattern, a
  size class) grow linearly with the data volume (TPC-H: customer =
  sf x 150k, part = sf x 200k). An explicit ``F.broadcast`` hint on
  these OVERRIDES ``spark.sql.autoBroadcastJoinThreshold`` — at the
  mandated 100 TB scale the executor would attempt (and die on) a
  multi-GB broadcast. These sites call :func:`scaled_dim`, which
  applies NO hint: at small scale Catalyst's static size estimate
  (parquet file bytes) and AQE's runtime shuffle statistics still pick
  a broadcast join automatically; at production scale the identical
  query plans a shuffle join. The strategy is the optimizer's call,
  sized from the actual relation — never forced.

``tests/test_scale_broadcasts.py`` pins the contract: with every
automatic broadcast disabled (static + adaptive thresholds set to -1,
simulating at-scale relation sizes) each scale-critical query still
plans shuffle joins for its scaling dims — no cartesian fallback —
and returns results identical to the default-config run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bounded_broadcast(df: DataFrame) -> DataFrame:
    """Broadcast hint for a provably scale-invariant relation.

    Use ONLY when the argument's row count is bounded by the schema
    (region/nation keys, enum domains, 1-row global aggregates, probe
    tables) — never for a relation whose size grows with the data.
    """
    return F.broadcast(df)


def scaled_dim(df: DataFrame) -> DataFrame:
    """Mark an sf-scaling dimension (customer/supplier/part or any
    constant-fraction slice): returns the relation UN-hinted so the
    join strategy is chosen by the optimizer from the relation's actual
    size — broadcast at small scale, shuffle join at 100 TB.

    The identity body is the point: the call-site documents (and the
    plan test enforces) that no one reintroduces a forced hint here.
    """
    return df
