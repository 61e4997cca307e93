"""The portable md5-60 hash family must agree across its three
renderings (Spark JVM, Python kernel, DuckDB SQL) — that agreement is
what upgrades the MinHash/SimHash gate queries from rows-only to fully
hash-checked."""

import duckdb
import pytest
from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.functions import portable_hash as ph

SAMPLES = ["hello", "the quick brown fox", "0:a b", "ümlaut text", "", "7:x y"]


def test_python_vs_duckdb():
    con = duckdb.connect()
    for s in SAMPLES:
        got = con.execute(
            f"SELECT {ph.sql_md5_int60('s')} FROM (SELECT ? AS s)", [s]
        ).fetchone()[0]
        assert got == ph.py_md5_int60(s), s


def test_python_vs_spark(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    rows = df.select("s", ph.md5_int60("s").alias("h")).collect()
    assert len(rows) == len(SAMPLES)
    for r in rows:
        assert r["h"] == ph.py_md5_int60(r["s"]), r["s"]
        assert 0 <= r["h"] < 1 << 60


def test_portable_minhash_candidates_match_oracle_banding(spark):
    """The portable signature kernel must produce, for a tiny corpus,
    identical band keys to a direct Python re-derivation (the same
    computation the SQL oracle spells relationally)."""
    from asset_prices_parquet_saver_spark.operators import dedup

    docs = [
        (1, "a b c d e f"),
        (2, "a b c d e f"),  # exact dup of 1 → all bands collide
        (3, "a b c d e g"),  # near dup
        (4, "x y z w v u"),  # unrelated
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    arrs = {
        r["id"]: r["sig"]
        for r in dedup._portable_signature_arrays(df, "doc_id", "text", 2, 32).collect()
    }
    for doc_id, text in docs:
        w = text.split()
        sh = {" ".join(w[j : j + 2]) for j in range(len(w) - 1)}
        expect = [min(ph.py_md5_int60(f"{i}:{s}") for s in sh) for i in range(32)]
        assert arrs[doc_id] == expect, doc_id
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_dedup(
            df, "doc_id", "text", hash_family="md5"
        ).collect()
    }
    assert (1, 2) in pairs
    assert not any(4 in p for p in pairs)


def test_hypothesis_python_vs_duckdb_agree():
    """Property: the Python and DuckDB renderings agree on arbitrary
    unicode strings (the Spark rendering is pinned separately — it
    needs a session; md5 is md5 everywhere once bytes agree)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    # NUL is rejected by DuckDB VARCHAR; surrogates aren't UTF-8
    alphabet = st.characters(
        blacklist_characters="\x00", blacklist_categories=("Cs",)
    )
    @settings(max_examples=60, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=80))
    def check(s):
        got = con.execute(
            f"SELECT {ph.sql_md5_int60('s')} FROM (SELECT ? AS s)", [s]
        ).fetchone()[0]
        assert got == ph.py_md5_int60(s)

    check()


class TestRound6Portable:
    """The 6-decimal rounding contract (numeric.round6_portable /
    round6_sql) must produce identical values on Spark and DuckDB for
    the adversarial class that broke CORRECTNESS_r05's daily_returns:
    quotients of low-scale decimals that land exactly on a dyadic
    .xxxxxx5 midpoint, where engine round()/decimal-cast midpoint
    rules have diverged between builds. The IEEE-floor construction
    (floor(x*1e6 + 0.5)/1e6) uses only exactly-specified IEEE-754
    operations, so any two conforming engines must agree bit-for-bit."""

    # exact dyadic midpoints (1/2^7, 3/2^8, ...), near-midpoints from
    # both sides, negatives, zero, and plain values
    CASES = [
        0.0078125, -0.0078125, 0.01171875, 3.0078125, -2.0046875,
        0.0000005, -0.0000005, 0.0000004999999, 0.0000015,
        0.1234565, -0.1234565, 0.123456789, -98.7654321,
        0.0, 1.0, -1.0, 100.0, 0.5, 1e-7, -1e-7,
    ]

    def test_spark_vs_duckdb_bitwise(self, spark):
        from asset_prices_parquet_saver_spark.functions.numeric import (
            round6_portable,
            round6_sql,
        )

        df = spark.createDataFrame([(x,) for x in self.CASES], "x double")
        got_spark = {
            r["x"]: r["y"]
            for r in df.select("x", round6_portable("x").alias("y")).collect()
        }
        con = duckdb.connect()
        for x in self.CASES:
            got_duck = con.execute(
                f"SELECT {round6_sql('x')} FROM (SELECT CAST(? AS DOUBLE) AS x)",
                [x],
            ).fetchone()[0]
            assert got_spark[x].hex() == got_duck.hex(), (
                x, got_spark[x], got_duck
            )

    def test_half_up_semantics(self, spark):
        """Pin the documented tie rule: midpoints round half-UP (toward
        +inf) — 0.0000005 -> 1e-6, -0.0000005 -> -0.0 -> 0.0 — and
        no -0.0 ever escapes (the gate's %.6g canon distinguishes it)."""
        from asset_prices_parquet_saver_spark.functions.numeric import (
            round6_portable,
        )

        df = spark.createDataFrame(
            [(0.0000005,), (-0.0000005,), (0.0078125,)], "x double"
        )
        out = {
            r["x"]: r["y"]
            for r in df.select("x", round6_portable("x").alias("y")).collect()
        }
        assert out[0.0000005] == 1e-06
        assert out[-0.0000005] == 0.0 and str(out[-0.0000005]) == "0.0"
        assert out[0.0078125] == 0.007813
