"""Zipf fit, k-anonymity suppression, temperature mix weights —
brute-force reference checks beyond the gated oracle queries."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.operators import sampling, text


def test_zipf_fit_matches_numpy_ols(spark):
    docs = [
        "a a a a a a b b b c c d",
        "a a b b c d e e e",
        "a b c d f g h",
    ]
    df = spark.createDataFrame([Row(text=t) for t in docs])
    row = text.zipf_fit(df, "text", top_n=5).collect()[0]
    # reference: exact term counts -> top-5 -> OLS on (ln rank, ln freq)
    from collections import Counter

    counts = Counter(w for t in docs for w in t.split())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    xs = [math.log(i + 1) for i in range(len(top))]
    ys = [math.log(f) for _, f in top]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    slope = sxy / sxx
    intercept = my - slope * mx
    assert row["n_terms"] == 5
    assert row["zipf_slope"] == pytest.approx(round(slope, 6), abs=1e-6)
    assert row["zipf_intercept"] == pytest.approx(round(intercept, 6), abs=1e-6)
    assert 0.0 <= row["zipf_r2"] <= 1.0


def test_k_anonymous_suppresses_rare_combos(spark):
    rows = (
        [Row(i=i, src="a", lang="en") for i in range(5)]
        + [Row(i=10, src="a", lang="fr")]          # combo of size 1 < 3
        + [Row(i=20 + i, src="b", lang="en") for i in range(3)]
    )
    df = spark.createDataFrame(rows, "i long, src string, lang string")
    kept = {r["i"] for r in sampling.k_anonymous(df, ["src", "lang"], 3).collect()}
    assert kept == set(range(5)) | {20, 21, 22}
    with pytest.raises(ValueError):
        sampling.k_anonymous(df, ["src"], 0)


def test_temperature_mix_weights_sum_and_order(spark):
    df = spark.createDataFrame(
        [Row(src="big")] * 90 + [Row(src="small")] * 10, "src string"
    )
    out = {
        r["grp"]: (r["n_rows"], r["weight"])
        for r in sampling.temperature_mix_weights(df, "src", 0.3).collect()
    }
    assert out["big"][0] == 90 and out["small"][0] == 10
    # alpha < 1 compresses the gap: natural 9:1 -> ~1.93:1 at alpha=.3
    ratio = out["big"][1] / out["small"][1]
    assert ratio == pytest.approx(90 ** 0.3 / 10 ** 0.3, rel=1e-4)
    assert out["big"][1] + out["small"][1] == pytest.approx(1.0, abs=2e-6)
    # alpha=0 is uniform
    uni = {
        r["grp"]: r["weight"]
        for r in sampling.temperature_mix_weights(df, "src", 0.0).collect()
    }
    assert uni["big"] == uni["small"] == 0.5
