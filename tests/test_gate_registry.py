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
