"""At-scale join-strategy contract for the star-join query family.

The sf-scaling dimensions (customer / supplier / part and their
constant-fraction slices) must never be hint-forced into a broadcast:
an explicit ``F.broadcast`` overrides ``autoBroadcastJoinThreshold``,
so at the mandated 100 TB scale the executor would attempt (and die
on) a multi-GB broadcast. ``functions/hints.py`` routes those sites
through ``scaled_dim`` (no hint) and keeps hints only on provably
bounded relations (region / nation / 1-row aggregates / enum domains).

These tests simulate at-scale relation sizes by disabling every
AUTOMATIC broadcast (static and adaptive thresholds = -1). Each query
must then:

1. plan its scaling-dim joins as shuffle joins (SortMergeJoin /
   ShuffledHashJoin) with no cartesian fallback — the 100 TB shape;
2. return results identical to the default-config run (strategy
   changes values never).

Bounded relations keep their explicit hints and are ALLOWED to
broadcast here: shipping 25 nation rows to every executor is correct
at any scale.
"""

from __future__ import annotations

import pytest

from asset_prices_parquet_saver_spark.plans import QUERIES

# Every query that joins an sf-scaling dimension into a fact table —
# the 14 star-join shapes whose hints round 6's audit flagged as
# force-broadcasting customer/supplier/part (plus the two same-class
# sites the audit missed: supplier_count_by_part, promo_revenue_share).
SCALE_QUERIES = [
    "region_revenue",
    "top_building_orders",
    "nation_trade_volume",
    "nation_market_share",
    "product_profit_by_nation",
    "top_supplier_revenue",
    "region_revenue_concentration",
    "nation_trade_pagerank",
    "suppliers_kept_waiting",
    "disjunctive_revenue",
    "supplier_count_by_part",
    "promo_revenue_share",
    "dominant_share_suppliers",
    "min_cost_supplier_per_part",
]

_NO_BROADCAST = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def _rows(df):
    return sorted(repr(r) for r in df.collect())


@pytest.fixture()
def no_auto_broadcast(spark):
    try:
        for k, v in _NO_BROADCAST.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k in _NO_BROADCAST:  # get_spark sets neither -> unset restores
            spark.conf.unset(k)


@pytest.mark.parametrize("name", SCALE_QUERIES)
def test_scaling_dims_shuffle_join_when_broadcast_impossible(
    spark, sf_dir, name, no_auto_broadcast
):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name != "nation_trade_pagerank":
        # the scaling-dim joins fall back to a shuffle strategy...
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, name
    # (pagerank's iterations localCheckpoint each round, so the final
    # plan is a truncated ExistingRDD scan — but the edge build and
    # every iteration just EXECUTED under the no-broadcast confs while
    # the query was constructed, which is the stronger check.)
    # ...never to a cartesian product (every cross join in these
    # queries is a hinted 1-row/bounded aggregate -> BNLJ, not CP)
    assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize("name", SCALE_QUERIES)
def test_results_invariant_to_join_strategy(spark, sf_dir, name):
    baseline = _rows(QUERIES[name](spark, sf_dir))
    try:
        for k, v in _NO_BROADCAST.items():
            spark.conf.set(k, v)
        shuffled = _rows(QUERIES[name](spark, sf_dir))
    finally:
        for k in _NO_BROADCAST:
            spark.conf.unset(k)
    assert shuffled == baseline, name
