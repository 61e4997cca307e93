"""Approximate (sketch) aggregates: accuracy bounds vs exact values."""

from __future__ import annotations

from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.plans import QUERIES
from asset_prices_parquet_saver_spark.sources.tables import read_table


def test_approx_distinct_within_5pct(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.approx_users
        for r in QUERIES["approx_user_stats"](spark, sf_dir).collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(1, 0.05 * n), (k, approx[k], n)


def test_stratified_sample_fractions_and_determinism(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    totals = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    fractions = {"click": 0.5, "view": 0.1, "purchase": 1.0, "error": 1.0, "signup": 0.25}
    s1 = QUERIES["stratified_event_sample"](spark, sf_dir).collect()
    s2 = QUERIES["stratified_event_sample"](spark, sf_dir).collect()
    # seeded → identical across runs (required for the driver's
    # rows-only re-execution check)
    assert {r.event_id for r in s1} == {r.event_id for r in s2}
    got = {}
    for r in s1:
        got[r.event_type] = got.get(r.event_type, 0) + 1
    for etype, frac in fractions.items():
        if etype not in totals:
            continue
        expect = totals[etype] * frac
        if frac == 1.0:
            assert got.get(etype, 0) == totals[etype]
        else:
            # Bernoulli sampling: allow 5 sigma
            import math

            sigma = math.sqrt(totals[etype] * frac * (1 - frac))
            assert abs(got.get(etype, 0) - expect) <= 5 * sigma + 1, etype


def test_approx_median_within_tolerance(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.m
        for r in ev.groupBy("event_type")
        .agg(F.percentile("value", F.lit(0.5)).alias("m"))
        .collect()
    }
    approx = {
        r.event_type: r.approx_median
        for r in QUERIES["approx_user_stats"](spark, sf_dir).collect()
    }
    for k, m in exact.items():
        # percentile_approx with 10k accuracy returns an actual data
        # value near the true median
        assert abs(approx[k] - m) <= max(0.5, 0.05 * abs(m)), (k, approx[k], m)


def test_mix_to_proportions_hits_targets(spark, sf_dir):
    from asset_prices_parquet_saver_spark.operators import sampling

    docs = read_table(spark, sf_dir, "documents")
    targets = {"en": 40, "de": 20, "es": 15, "fr": 15, "zh": 10}
    out = sampling.mix_to_proportions(docs, "lang", "doc_id", targets)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    total = sum(got.values())
    # thresholding is binomially tight around each stratum's exact keep
    # count k_s; at these sizes allow generous slack but require shape
    for lang, pct in targets.items():
        assert abs(got.get(lang, 0) / total - pct / 100) < 0.12
    # the binding (scarcest-relative-to-target) stratum is kept whole:
    # its threshold is exactly 16^8, the 9-hex-digit edge case
    n_by_lang = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    binding = min(targets, key=lambda s: n_by_lang[s] * 100 // targets[s])
    assert got[binding] == n_by_lang[binding]
    # deterministic: identical row set on a rerun
    ids1 = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in sampling.mix_to_proportions(docs, "lang", "doc_id", targets)
        .select("doc_id").collect()
    )
    assert ids1 == ids2


def test_assign_split_partitions_and_is_append_stable(spark, sf_dir):
    from asset_prices_parquet_saver_spark.operators import sampling

    docs = read_table(spark, sf_dir, "documents")
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    col = sampling.assign_split(F.col("doc_id"), splits)
    assigned = docs.select("doc_id", col.alias("split"))
    counts = {r["split"]: r["n"] for r in assigned.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == docs.count()  # every row labeled
    assert set(counts) <= {"train", "val", "test"}
    assert abs(counts["train"] / total - 0.8) < 0.08
    # append stability: the label of a row is a pure function of its
    # key — computing over any subset yields the same assignment
    subset = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", col.alias("split"))
    full = {r["doc_id"]: r["split"] for r in assigned.collect()}
    for r in subset.collect():
        assert full[r["doc_id"]] == r["split"]


def test_weighted_sample_prefers_heavy_rows(spark, sf_dir):
    """Efraimidis-Spirakis weighting: length-weighted selection must
    pull the sample's mean length above the corpus mean (deterministic
    given the fixed md5 keys), and be append-stable per stratum."""
    from asset_prices_parquet_saver_spark.operators.sampling import (
        weighted_stratified_sample,
    )

    d = read_table(spark, sf_dir, "documents")
    samp = weighted_stratified_sample(d, ["lang"], "doc_id", "n_chars", k=20)
    m_corpus = d.agg(F.avg("n_chars")).collect()[0][0]
    m_sample = samp.agg(F.avg("n_chars")).collect()[0][0]
    assert m_sample > m_corpus

    # determinism + append stability: re-derived sample is identical,
    # and restricting the corpus to one stratum reproduces its rows
    ids = {r["doc_id"] for r in samp.collect()}
    again = {r["doc_id"] for r in weighted_stratified_sample(d, ["lang"], "doc_id", "n_chars", 20).collect()}
    assert ids == again
    one_lang = d.filter(F.col("lang") == "en")
    sub = {r["doc_id"] for r in weighted_stratified_sample(one_lang, ["lang"], "doc_id", "n_chars", 20).collect()}
    full_en = {r["doc_id"] for r in samp.filter(F.col("lang") == "en").collect()}
    assert sub == full_en


def test_assign_split_cumulative_fraction_reaching_one(spark, sf_dir):
    """Cumulative fraction hitting exactly 1.0 produces the 9-hex-digit
    threshold 16^8; without zero-padding both sides the comparison goes
    lexical and the upper half of the keyspace falls through to the
    remainder label. Engine and oracle CASE must also agree row-wise."""
    from asset_prices_parquet_saver_spark.operators import sampling

    docs = read_table(spark, sf_dir, "documents")
    splits = [("train", 0.5), ("val", 0.5), ("test", 0.0)]
    col = sampling.assign_split(F.col("doc_id"), splits)
    counts = {
        r["split"]: r["n"]
        for r in docs.select(col.alias("split"))
        .groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    assert counts.get("test", 0) == 0  # zero-fraction label absorbs nothing
    assert abs(counts["train"] / total - 0.5) < 0.08
    assert abs(counts["val"] / total - 0.5) < 0.08
    # row-wise parity with the DuckDB CASE mirror (same padding rule)
    import duckdb

    case = sampling.split_oracle_case("doc_id", splits)
    oracle = dict(
        duckdb.connect().execute(
            f"SELECT doc_id, {case} AS split FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    engine = {r["doc_id"]: r["split"] for r in docs.select("doc_id", col.alias("split")).collect()}
    assert engine == oracle
