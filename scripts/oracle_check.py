#!/usr/bin/env python
"""Driver-simulation: run every ``queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB over the same parquet tables, then compare
row count, column names, and an order-insensitive value hash — the
same gate the driver applies at sf0.01 (CORRECTNESS_r{N}.json).

Usage: python scripts/oracle_check.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(val) -> str:
    """Canonicalize a cell the way a tolerant driver would."""
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if val != val:
            return "NULL"
        # NB: -0.0 deliberately canonicalizes to "-0" (as the driver's
        # %.6g does) — if an engine pair ever disagrees on zero sign,
        # this sim must FAIL like the driver would, not paper over it;
        # normalize in the query (x + 0.0 flips -0.0 to 0.0) instead.
        return f"{val:.6g}"
    if isinstance(val, bool):
        return str(int(val))
    if isinstance(val, (list, tuple)):
        return "[" + ",".join(canon(v) for v in val) + "]"
    if isinstance(val, bytes):
        return val.hex()
    return str(val)


def _pd_canon(v, duck_type: str):
    """Map a pandas-fetched cell back to the Python type ``fetchall``
    would produce WHERE THE CONVERSION IS LOSSLESS (timestamps keep ns,
    int64 stays exact), and keep the lossy conversions AS pandas made
    them (HUGEINT / NULL-bearing int lanes arrive as float64 and stay
    float) — so hashing these rows reproduces the driver's
    pandas-canon view of the oracle, mismatching exactly where a
    pandas-fetching driver would."""
    import numpy as np
    import pandas as pd

    if v is None or (not isinstance(v, (list, tuple, np.ndarray)) and pd.isna(v)):
        return None
    if isinstance(v, pd.Timestamp):
        return v.date() if duck_type.upper() == "DATE" else v.to_pydatetime()
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, np.ndarray):
        return [_pd_canon(x, "") for x in v.tolist()]
    return v


def _pandasize_rows(rows: list[dict], cols: list[str]) -> list[dict]:
    """Round-trip the Spark rows through a pandas DataFrame, applying
    the same dtype promotions the driver's frame build applies (a
    NULL-bearing int lane promotes to float64 and stays float)."""
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
        columns=cols
    )
    return [
        {c: _pd_canon(v, "") for c, v in zip(cols, row)}
        for row in pdf.itertuples(index=False, name=None)
    ]


def value_hash(rows: list[dict], cols: list[str]) -> str:
    cols = sorted(cols)
    lines = sorted("|".join(canon(r[c]) for c in cols) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from asset_prices_parquet_saver_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = e.queries(), e.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            sys.exit(f"oracle_check: unknown query names {sorted(unknown)}")
    failures: list[str] = []
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
            scols = sdf.columns
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark raised {type(ex).__name__}: {ex}")
            continue
        # Driver-canon compatibility probe: the external gate sorts the
        # result frame column-wise with pandas, which crashes on
        # array/map/struct cells (round-4 red rows). Ban complex output
        # types outright so a rotation of the gate window can't expose
        # an unsortable column again.
        from pyspark.sql.types import ArrayType, MapType, StructType

        complex_cols = [
            f.name
            for f in sdf.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            failures.append(name)
            print(f"FAIL  {name}: complex-typed output columns {complex_cols} "
                  "(driver canon cannot sort these)")
            continue
        if name not in osql:
            print(f"rows  {name}: {len(srows)} rows (rows-only check)")
            continue
        try:
            rel = con.execute(osql[name])
            ocols = [d[0] for d in rel.description]
            orows = [dict(zip(ocols, row)) for row in rel.fetchall()]
            # Pandas-parity fetch: the driver pulls BOTH sides through
            # pandas. On the DuckDB side that converts HUGEINT to
            # float64 outright; on EITHER side a NULL-bearing int lane
            # becomes float64. The two degradations must be simulated
            # symmetrically: Spark's nullable bigint lanes degrade
            # identically on the driver (so they still match — e.g.
            # asof_tolerance_lookup's NULLable asof_ts_us, driver-green
            # in r8), while HUGEINT degrades only the oracle side (the
            # r10/r11 "green locally, red under the driver" rows).
            # Hash both pandas views in addition to the exact path.
            rel2 = con.execute(osql[name])
            otypes = {d[0]: str(d[1]) for d in rel2.description}
            pdf = rel2.df()
            prows = [
                {
                    c: _pd_canon(v, otypes.get(c, ""))
                    for c, v in zip(ocols, row)
                }
                for row in pdf.itertuples(index=False, name=None)
            ]
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb raised {type(ex).__name__}: {ex}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not problems:
            sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
            if sh != oh:
                problems.append(f"valuehash spark={sh} duck={oh}")
            sprows = _pandasize_rows(srows, scols)
            sph, oph = value_hash(sprows, scols), value_hash(prows, ocols)
            if sph != oph:
                problems.append(
                    f"pandas-canon valuehash spark={sph} duck={oph} "
                    "(a lane degrades asymmetrically under the "
                    "driver's pandas fetch)"
                )
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(srows)} rows hash-match")

    skipped = len(qs) - ran
    tail = f" ({skipped} skipped by filter)" if skipped else ""
    print(f"\n{ran - len(failures)}/{ran} pass{tail}; failures: {failures or 'none'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
