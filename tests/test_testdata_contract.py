"""Startup probe against driver testdata regeneration.

Two rounds were burned by silent testdata drift (round 2: events.ts
changed physical type from TIMESTAMP(NANOS)-as-int64 to timestamp[us]
and every events query threw AnalysisException). This probe pins the
LOGICAL schema read_table must deliver for every table and forces a
row decode, so the next regeneration that the schema adapter cannot
absorb fails HERE, naming the table and column — not as 15 red gate
rows.

The pin is on the post-adapter logical schema: a physical change the
adapter absorbs (any event-time encoding listed in
sources/tables._EVENT_TIME_COLUMNS) keeps these green by design.
"""

from __future__ import annotations

import os

import pytest

from asset_prices_parquet_saver_spark.schema import TESTDATA_TABLES
from asset_prices_parquet_saver_spark.sources.tables import read_table

#: post-adapter logical schema contract, name:type per column
EXPECTED = {
    "region": "r_regionkey:int, r_name:string",
    "nation": "n_nationkey:int, n_name:string, n_regionkey:int",
    "customer": "c_custkey:bigint, c_name:string, c_nationkey:int, c_acctbal:double, c_mktsegment:string",
    "supplier": "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
    "part": "p_partkey:bigint, p_name:string, p_brand:string, p_type:string, p_size:int, p_retailprice:double",
    "orders": "o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string",
    "lineitem": "l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, l_linenumber:int, l_quantity:double, l_extendedprice:double, l_discount:double, l_tax:double, l_returnflag:string, l_linestatus:string, l_shipdate:timestamp_ntz",
    "events": "event_id:bigint, ts:timestamp, user_id:bigint, event_type:string, value:double, props:string",
    "documents": "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
    "embeddings": "vec_id:bigint, embedding:array<float>, label:int",
}

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("table", TESTDATA_TABLES)
def test_testdata_schema_contract(spark, table):
    assert table in EXPECTED, f"no schema pin for new table {table}"
    for sf_dir in SF_DIRS:
        df = read_table(spark, sf_dir, table)
        got = ", ".join(f"{f.name}:{f.dataType.simpleString()}" for f in df.schema)
        exp = EXPECTED[table]
        if got != exp:
            gotd = dict(c.split(":", 1) for c in got.split(", "))
            expd = dict(c.split(":", 1) for c in exp.split(", "))
            drift = sorted(
                f"{c}: expected {expd.get(c, '<absent>')}, got {gotd.get(c, '<absent>')}"
                for c in set(gotd) | set(expd)
                if gotd.get(c) != expd.get(c)
            )
            raise AssertionError(
                f"TESTDATA DRIFT in {sf_dir}/{table}.parquet — the driver "
                f"regenerated testdata with a schema the read_table adapter "
                f"does not absorb: {'; '.join(drift)}. Extend "
                f"sources/tables.py (see _EVENT_TIME_COLUMNS) or update the "
                f"pin here if the change is intentional."
            )
        # force a real decode through the vectorized reader — a type the
        # scanner rejects (round 2's failure mode) throws here, not in
        # 15 gate queries
        assert df.limit(1).count() in (0, 1)
