"""Bucketized interval join (operators/rangejoin.py): exactness vs the
naive theta join over adversarial randomized inputs, plan shape (hash
equi join, never a nested-loop product), and bucket-width invariance."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.operators.rangejoin import interval_join

FACT_SCHEMA = "fid long, k string, ts timestamp"
IV_SCHEMA = "iid long, k string, s timestamp, e timestamp"


def _t(hours: float) -> dt.datetime:
    return dt.datetime(2024, 3, 1) + dt.timedelta(hours=hours)


def _random_case(seed: int):
    rng = random.Random(seed)
    facts = [
        (i, rng.choice("ab"), _t(rng.uniform(0, 96))) for i in range(40)
    ]
    ivs = []
    for i in range(15):
        s = rng.uniform(-4, 92)
        # include empty and inverted intervals — must match nothing
        e = s + rng.choice([-1.0, 0.0, rng.uniform(0.1, 30)])
        ivs.append((i, rng.choice("ab"), _t(s), _t(e)))
    return facts, ivs


def _naive(facts, ivs, keyed: bool):
    return sorted(
        (f[0], iv[0])
        for f in facts
        for iv in ivs
        if iv[2] <= f[2] < iv[3] and (not keyed or f[1] == iv[1])
    )


def _bucketized(spark, facts, ivs, keyed: bool, bucket_seconds: int):
    fdf = spark.createDataFrame(facts, FACT_SCHEMA)
    idf = spark.createDataFrame(ivs, IV_SCHEMA)
    out = interval_join(
        fdf, idf, "ts", "s", "e",
        bucket_seconds=bucket_seconds,
        key_cols=["k"] if keyed else None,
    )
    return sorted((r["fid"], r["iid"]) for r in out.collect())


def test_matches_naive_unkeyed(spark):
    for seed in (1, 2, 3):
        facts, ivs = _random_case(seed)
        assert _bucketized(spark, facts, ivs, False, 3600) == _naive(
            facts, ivs, False
        ), f"seed {seed}"


def test_matches_naive_keyed(spark):
    facts, ivs = _random_case(7)
    assert _bucketized(spark, facts, ivs, True, 3600) == _naive(
        facts, ivs, True
    )


def test_bucket_width_invariance(spark):
    """The bucket width is a physical knob, not a semantic one."""
    facts, ivs = _random_case(11)
    expected = _naive(facts, ivs, False)
    for width in (60, 3600, 86_400, 7 * 86_400):
        assert _bucketized(spark, facts, ivs, False, width) == expected, width


def test_plan_is_hash_equi_join(spark):
    """The whole point: the physical plan must be a hash/merge equi
    join on the bucket id, not BroadcastNestedLoopJoin/Cartesian."""
    facts, ivs = _random_case(5)
    fdf = spark.createDataFrame(facts, FACT_SCHEMA)
    idf = spark.createDataFrame(ivs, IV_SCHEMA)
    plan = (
        interval_join(fdf, idf, "ts", "s", "e", bucket_seconds=3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
