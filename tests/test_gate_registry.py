"""Guards on the driver-contract registry: the gate window and bench
headline list are curated by hand — these tests fail loudly when an
edit breaks their invariants instead of silently costing a round of
driver evidence."""

from __future__ import annotations

from collections import Counter

from asset_prices_parquet_saver_spark.plans import ORACLE, QUERIES
from asset_prices_parquet_saver_spark.plans.queries import _GATE_ORDER

#: queries that are rows-only BY DESIGN (documented in COVERAGE.md)
ROWS_ONLY = {"approx_user_stats"}


def test_gate_order_is_a_permutation_of_the_registry():
    assert sorted(_GATE_ORDER) == sorted(QUERIES)
    assert not [k for k, c in Counter(_GATE_ORDER).items() if c > 1]


def test_registry_iteration_follows_gate_order():
    assert list(QUERIES) == [n for n in _GATE_ORDER if n in QUERIES]


def test_every_window_query_is_hash_checkable():
    """The driver evaluates the FIRST 50 entries; a window slot spent
    on a rows-only query wastes driver evidence."""
    window = list(QUERIES)[:50]
    missing = [n for n in window if n not in ORACLE and n not in ROWS_ONLY]
    assert missing == []


def test_all_oracles_reference_registered_queries():
    assert not set(ORACLE) - set(QUERIES)


def test_bench_headline_names_resolve():
    import bench

    unknown = [n for n in bench.HEADLINE if n not in QUERIES]
    assert unknown == []


def test_no_oracle_emits_hugeint_lanes():
    """DuckDB types SUM(BIGINT) / list_sum(BIGINT[]) as HUGEINT. A
    pandas-fetching comparator (the driver) converts HUGEINT to
    float64, which re-renders exact ints in %.6g scientific notation
    and corrupts values past 2^53 — rows+schema stay green while the
    value hash goes red, and a fetchall()-based local gate cannot see
    it (the r10/r11 `orc_roundtrip_orders` / `cdc_dup_chunks` reds).
    DESCRIBE every oracle (no execution) and fail on any HUGEINT,
    UHUGEINT, or >18-digit DECIMAL output lane."""
    import re

    import duckdb

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad: list[str] = []
    for name, sql in ORACLE.items():
        cols = con.execute(f"DESCRIBE {sql}").fetchall()
        for col, typ, *_ in cols:
            t_up = typ.upper()
            wide_dec = re.match(r"DECIMAL\((\d+)", t_up)
            if (
                "HUGEINT" in t_up
                or (wide_dec and int(wide_dec.group(1)) > 18)
            ):
                bad.append(f"{name}.{col}: {typ}")
    assert bad == [], (
        "oracle output lanes wider than the driver canon survives "
        f"(cast to BIGINT/DOUBLE in the SQL): {bad}"
    )
