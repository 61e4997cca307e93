"""Unit tests: symbol universe ops (A1/J1/J2/P6/P16) and compare (J6)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from asset_prices_parquet_saver_spark.operators.compare import data_diff, schema_diff
from asset_prices_parquet_saver_spark.operators.symbols import (
    exclude_status,
    parse_invalid_symbols,
    tradable_only,
    union_universe,
)


def test_union_universe_uppercases_and_dedupes(spark):
    a = spark.createDataFrame([Row(symbol="aapl"), Row(symbol="MSFT")])
    b = spark.createDataFrame([Row(symbol="AAPL"), Row(symbol="goog")])
    out = sorted(r.symbol for r in union_universe(a, b).collect())
    assert out == ["AAPL", "GOOG", "MSFT"]


def test_exclude_status_anti_join(spark):
    from asset_prices_parquet_saver_spark.schema import SYMBOL_STATUS_SCHEMA

    syms = spark.createDataFrame([Row(symbol=s) for s in ["A", "B", "C"]])
    status = spark.createDataFrame(
        [
            ("B", "alpaca", "invalid", None),
            ("C", "yfinance", "invalid", None),
        ],
        SYMBOL_STATUS_SCHEMA,
    )
    out = sorted(r.symbol for r in exclude_status(syms, status, "alpaca").collect())
    assert out == ["A", "C"]  # C only invalid for yfinance


def test_tradable_filter(spark):
    assets = spark.createDataFrame(
        [Row(symbol="A", tradable=True), Row(symbol="B", tradable=False)]
    )
    assert [r.symbol for r in tradable_only(assets).collect()] == ["A"]


def test_parse_invalid_symbols(spark):
    msgs = spark.createDataFrame(
        [Row(message="400: invalid symbols found: abc, DEF, ghi")]
    )
    out = sorted(r.symbol for r in parse_invalid_symbols(msgs).collect())
    assert out == ["ABC", "DEF", "GHI"]


def test_schema_diff(spark):
    d1 = spark.createDataFrame([Row(a=1, b="x", c=1.0)])
    d2 = spark.createDataFrame([Row(a=1, b=2, d=True)])
    diff = schema_diff(d1, d2)
    assert diff["only_in_left"] == ["c"]
    assert diff["only_in_right"] == ["d"]
    assert diff["type_mismatch"] == [("b", "string", "bigint")]


def test_data_diff_kinds(spark):
    d1 = spark.createDataFrame(
        [Row(k=1, v=1.0), Row(k=2, v=2.0), Row(k=3, v=3.0)]
    )
    d2 = spark.createDataFrame(
        [Row(k=1, v=1.0), Row(k=2, v=99.0), Row(k=4, v=4.0)]
    )
    out = {r.k: r.diff_kind for r in data_diff(d1, d2, ["k"]).collect()}
    # k=1 equal → excluded; k=2 mismatch; k=3 left_only; k=4 right_only
    assert out == {2: "mismatch", 3: "left_only", 4: "right_only"}


def test_market_cap_categorization(spark):
    from asset_prices_parquet_saver_spark.operators.symbols import (
        categorize_market_caps,
        universe_by_categories,
    )

    caps = spark.createDataFrame(
        [
            ("aapl", 3.0e12),   # mega
            ("mid1", 5.0e9),    # mid
            ("tiny", 1.0e6),    # nano
            ("nocap", None),    # NULL category
        ],
        "symbol string, market_cap double",
    )
    got = {r.symbol: r.category for r in categorize_market_caps(caps).collect()}
    assert got == {"aapl": "mega", "mid1": "mid", "tiny": "nano", "nocap": None}

    assert {r.symbol for r in universe_by_categories(caps, ["mega", "nano"]).collect()} == {
        "AAPL",
        "TINY",
    }
    # 'all' selects every non-NULL-cap bucket
    assert universe_by_categories(caps, ["all"]).count() == 4


# ----------------------- record linkage: blocked edit-distance match

def test_blocked_edit_matches_respects_blocks_and_band():
    from pyspark.sql import functions as F

    from asset_prices_parquet_saver_spark.operators import linkage
    from asset_prices_parquet_saver_spark.session import get_spark

    spark = get_spark()
    rows = [
        (1, "small ring", 5),
        (2, "small ring", 5),   # exact dup: excluded (min_dist=1)
        (3, "small king", 5),   # dist 1 from both: kept
        (4, "small king", 9),   # other block: never paired
        (5, "large ring", 5),   # different first token: other block
    ]
    df = spark.createDataFrame(rows, ["k", "nm", "sz"])
    out = linkage.blocked_edit_matches(
        df, "k", "nm",
        {"sz": F.col("sz"), "b1": F.split(F.col("nm"), " ").getItem(0)},
        min_dist=1, max_dist=3,
    )
    pairs = {(r.key_a, r.key_b, r.edit_dist) for r in out.collect()}
    assert pairs == {(1, 3, 1), (2, 3, 1)}


def test_blocked_edit_matches_threshold_cuts_far_pairs():
    from pyspark.sql import functions as F

    from asset_prices_parquet_saver_spark.operators import linkage
    from asset_prices_parquet_saver_spark.session import get_spark

    spark = get_spark()
    df = spark.createDataFrame(
        [(1, "aaaa bbbb", 1), (2, "aaaa zzzz", 1)], ["k", "nm", "sz"]
    )
    out = linkage.blocked_edit_matches(
        df, "k", "nm", {"sz": F.col("sz")}, min_dist=1, max_dist=3
    )
    assert out.count() == 0  # distance 4 > max_dist


def test_edit_matches_qgram_equals_block_randomized():
    """Ed-Join prefix filtering is SOUND and exact: on randomized
    near-duplicate corpora the qgram strategy must return exactly the
    block strategy's pairs (which the brute-force-shaped block join
    defines)."""
    import random

    from pyspark.sql import functions as F

    from asset_prices_parquet_saver_spark.operators import linkage
    from asset_prices_parquet_saver_spark.session import get_spark

    spark = get_spark()
    rng = random.Random(1234)
    words = ["alpha", "bravo", "china", "delta", "echos", "fox"]
    rows = []
    k = 0
    for _ in range(120):
        base = " ".join(rng.choice(words) for _ in range(3))
        rows.append((k, base, rng.randint(0, 2))); k += 1
        if rng.random() < 0.6:  # perturbed near-duplicate
            chars = list(base)
            for _ in range(rng.randint(1, 3)):
                op = rng.random()
                pos = rng.randrange(len(chars))
                if op < 0.4:
                    chars[pos] = rng.choice("xyz")
                elif op < 0.7:
                    chars.insert(pos, rng.choice("xyz"))
                elif len(chars) > 1:
                    del chars[pos]
            rows.append((k, "".join(chars), rows[-1][2])); k += 1
    df = spark.createDataFrame(rows, ["k", "nm", "sz"])
    blocks = {"sz": F.col("sz")}
    got_block = {
        tuple(r)
        for r in linkage.blocked_edit_matches(
            df, "k", "nm", blocks, strategy="block"
        ).collect()
    }
    got_qgram = {
        tuple(r)
        for r in linkage.blocked_edit_matches(
            df, "k", "nm", blocks, strategy="qgram"
        ).collect()
    }
    assert got_qgram == got_block and got_block  # non-trivial + identical


def test_edit_matches_qgram_unblocked_global_join():
    """With an empty blocking dict the qgram path is a GLOBAL fuzzy
    self-join (pure Ed-Join) — no blocking key needed for the
    candidate generation to stay bounded."""
    from asset_prices_parquet_saver_spark.operators import linkage
    from asset_prices_parquet_saver_spark.session import get_spark

    spark = get_spark()
    df = spark.createDataFrame(
        [
            (1, "electric blue paint"),
            (2, "electric blue pains"),      # dist 1
            (3, "electric glue pains"),      # dist 1 from 2, 2 from 1
            (4, "totally different words"),
        ],
        ["k", "nm"],
    )
    pairs = {
        (r.key_a, r.key_b, r.edit_dist)
        for r in linkage.edit_matches_qgram(
            df, "k", "nm", {}, min_dist=1, max_dist=3
        ).collect()
    }
    assert pairs == {(1, 2, 1), (2, 3, 1), (1, 3, 2)}
