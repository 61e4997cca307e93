"""Distributed global ordering must agree with the single-partition
window functions it replaces, while keeping the full-data path free of
unpartitioned WindowExec nodes."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.operators import globalorder


@pytest.fixture()
def df(spark):
    # duplicate values, unique tie-break id, odd count (uneven buckets)
    rows = [(i, (i * 7919) % 13) for i in range(1003)]
    return spark.createDataFrame(rows, "id long, v long").repartition(7)


def test_global_row_number_matches_window(df):
    order = [F.col("v").asc(), F.col("id").asc()]
    got = {
        r["id"]: r["rn"]
        for r in globalorder.with_global_row_number(df, order).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order)).cast("long")
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n", [2, 4, 5, 32])
def test_global_ntile_matches_window(df, n):
    order = [F.col("v").asc(), F.col("id").asc()]
    got = {
        r["id"]: r["band"] for r in globalorder.global_ntile(df, order, n).collect()
    }
    want = {
        r["id"]: r["band"]
        for r in df.withColumn(
            "band", F.ntile(n).over(Window.orderBy(*order)).cast("long")
        ).collect()
    }
    assert got == want


def test_no_unpartitioned_window_on_data(df):
    """The row-numbering window over the data must be keyed by the
    partition id; the only partition-less window allowed is the offsets
    running sum, whose input is the per-partition count aggregate."""
    order = [F.col("v").asc(), F.col("id").asc()]
    plan = (
        globalorder.with_global_row_number(df, order)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    window_lines = [ln for ln in plan.splitlines() if "Window [" in ln.strip()]
    assert window_lines, plan
    for ln in window_lines:
        if "row_number" in ln:
            assert "__pid" in ln.split("windowspecdefinition")[1], ln


def test_global_cumsum_matches_window(df):
    order = [F.col("v").asc(), F.col("id").asc()]
    got = {
        r["id"]: r["cum"]
        for r in globalorder.with_global_cumsum(df, order, "v").collect()
    }
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w).cast("long")).collect()
    }
    assert got == want


def test_pack_by_budget_properties(df):
    order = [F.col("id").asc()]
    out = globalorder.pack_by_budget(df, order, "v", budget=50).collect()
    rows = sorted(out, key=lambda r: r["id"])
    # shards are contiguous, non-decreasing along the order, start at 0
    shards = [r["shard"] for r in rows]
    assert shards[0] == 0
    assert all(b - a in (0, 1) or b == a for a, b in zip(shards, shards[1:]))
    assert shards == sorted(shards)
    # every row's start offset lies in its shard's window
    start = 0
    for r in rows:
        assert r["shard"] == start // 50, r
        start += r["v"]


def test_global_cumsum_fractional_values(df):
    """The prefix sum must NOT truncate fractional local sums mid-
    computation (a long cast of the per-partition running sum dropped
    the fraction BEFORE the cross-partition offsets were added)."""
    d = df.withColumn("f", F.col("v") + F.lit(0.6))
    order = [F.col("v").asc(), F.col("id").asc()]
    got = {
        r["id"]: r["cum"]
        for r in globalorder.with_global_cumsum(d, order, "f", num_partitions=4).collect()
    }
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = {r["id"]: r["cum"] for r in d.withColumn("cum", F.sum("f").over(w)).collect()}
    assert all(abs(got[k] - want[k]) < 1e-9 for k in want)


def test_global_cumsum_property_random_doubles(spark):
    """Randomized: the distributed prefix sum over fractional values
    must match a straight-line Python running sum for every partition
    count (the long-cast truncation bug was invisible to integer
    fixtures)."""
    import random

    rng = random.Random(7)
    rows = [(i, rng.choice([0.25, 0.6, 1.5, -0.75, 2.0])) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, v double")
    order = [F.col("id").asc()]
    running, want = 0.0, {}
    for i, v in rows:
        running += v
        want[i] = running
    for parts in (1, 3, 8):
        got = {
            r["id"]: r["cum"]
            for r in globalorder.with_global_cumsum(
                df, order, "v", num_partitions=parts
            ).collect()
        }
        assert all(abs(got[k] - want[k]) < 1e-9 for k in want), parts


def test_grouped_row_number_matches_window_form(spark):
    """with_grouped_row_number == Window.partitionBy(group).orderBy(...)
    under a total order, for every partition count — plus the group
    count riding cnt_col. The grouped form exists so a low-cardinality
    group key never serializes the sort into #groups tasks."""
    import random

    rng = random.Random(13)
    rows = [
        (i, rng.choice(["A", "B", "C"]), rng.randrange(1000))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    order = [F.col("v").asc(), F.col("id").asc()]  # total order
    w = Window.partitionBy("g").orderBy(*order)
    want = {
        (r["g"], r["id"]): (r["rn"], r["n"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("g")))
        .collect()
    }
    for parts in (1, 4, 16):
        got = {
            (r["g"], r["id"]): (r["rn"], r["n"])
            for r in globalorder.with_grouped_row_number(
                df, ["g"], order, rn_col="rn", cnt_col="n",
                num_partitions=parts,
            ).collect()
        }
        assert got == want, parts
