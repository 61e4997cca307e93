"""Z-order layout: Morton-key correctness, curve-block locality bound,
and the actual file-skipping win measured from parquet footer stats."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.operators import layout
from asset_prices_parquet_saver_spark.sources.tables import read_table


def _morton_ref(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_reference_interleave(spark):
    rows = [(a, b) for a in [0, 1, 5, 170, 255] for b in [0, 3, 128, 255]]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select("a", "b", layout.z_value(F.col("a"), F.col("b"), 8).alias("z")).collect()
    for r in got:
        assert r["z"] == _morton_ref(r["a"], r["b"], 8), (r["a"], r["b"])


def test_zorder_sql_mirrors_z_value():
    import duckdb

    con = duckdb.connect()
    expr = layout.zorder_sql("a", "b", 8)
    rows = con.execute(
        f"SELECT a, b, {expr} AS z FROM (SELECT unnest([0,1,5,170,255]) a, 37 b)"
    ).fetchall()
    for a, b, z in rows:
        assert z == _morton_ref(a, b, 8)


def test_locality_blocks_are_16x16_tiles(spark, sf_dir):
    e = read_table(spark, sf_dir, "events").select(
        "user_id", F.floor("value").cast("long").alias("fv")
    )
    rep = layout.zorder_locality(e, "user_id", "fv", bits=8, block_shift=8).collect()
    assert len(rep) > 1
    for r in rep:
        # aligned 256-key curve block = one 16x16 tile of the grid
        assert r["a_max"] - r["a_min"] <= 15, r
        assert r["b_max"] - r["b_min"] <= 15, r


def _bbox_area_sum(path: str, a_col: str, b_col: str) -> float:
    total = 0.0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        amin = amax = bmin = bmax = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                st = col.statistics
                if st is None:
                    continue
                name = col.path_in_schema
                if name == a_col:
                    amin = st.min if amin is None else min(amin, st.min)
                    amax = st.max if amax is None else max(amax, st.max)
                elif name == b_col:
                    bmin = st.min if bmin is None else min(bmin, st.min)
                    bmax = st.max if bmax is None else max(bmax, st.max)
        if amin is None or bmin is None:
            pytest.skip("parquet footers carry no stats on this build")
        total += (amax - amin + 1) * (bmax - bmin + 1)
    return total


def test_write_zordered_shrinks_file_bounding_boxes(spark, sf_dir, tmp_path):
    e = read_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").bitwiseAND(F.lit(255)).alias("ua"),
        F.floor("value").cast("long").bitwiseAND(F.lit(255)).alias("vb"),
    )
    base = str(tmp_path / "natural")
    zord = str(tmp_path / "zordered")
    # natural order = arrival (event_id) order, what a plain saver writes
    e.repartitionByRange(8, "event_id").write.mode("overwrite").parquet(base)
    layout.write_zordered(e, zord, "ua", "vb", bits=8, num_files=8)

    area_base = _bbox_area_sum(base, "ua", "vb")
    area_z = _bbox_area_sum(zord, "ua", "vb")
    # arrival order is uncorrelated with (ua, vb): every file spans
    # ~the full grid. Z-order files cover contiguous curve segments →
    # bounded tiles. Require a big, non-flaky margin.
    assert area_z < 0.5 * area_base, (area_z, area_base)

    # and the data survives the round-trip intact
    back = spark.read.parquet(zord)
    assert back.count() == e.count()
    assert sorted(back.columns) == sorted(e.columns)


def _morton_ref_n(vals, bits):
    n = len(vals)
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * n + j)
    return z


def test_z_value_n_matches_reference_and_2d_special_case(spark):
    rows = [(5, 170, 33), (0, 255, 1), (255, 0, 128)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = df.select(
        "a", "b", "c",
        layout.z_value_n([F.col("a"), F.col("b"), F.col("c")], 8).alias("z3"),
        layout.z_value_n([F.col("a"), F.col("b")], 8).alias("z2n"),
        layout.z_value(F.col("a"), F.col("b"), 8).alias("z2"),
    ).collect()
    for r in got:
        assert r["z3"] == _morton_ref_n([r["a"], r["b"], r["c"]], 8)
        assert r["z2n"] == r["z2"]  # 2-col round-robin == pairwise interleave


def test_zorder_sql_n_mirrors_z_value_n():
    import duckdb

    expr = layout.zorder_sql_n(["a", "b", "c"], 8)
    rows = duckdb.connect().execute(
        f"SELECT a, b, c, {expr} AS z FROM (SELECT 5 a, 170 b, 33 c)"
    ).fetchall()
    a, b, c, z = rows[0]
    assert z == _morton_ref_n([a, b, c], 8)


def test_z_value_bits_overflow_guard(spark):
    import pytest
    from pyspark.sql import functions as F

    from asset_prices_parquet_saver_spark.operators import layout

    with pytest.raises(ValueError, match="63 usable bits"):
        layout.z_value(F.col("a"), F.col("b"), bits=32)
    with pytest.raises(ValueError, match="63 usable bits"):
        layout.z_value_n([F.col("a")] * 4, bits=16)
    with pytest.raises(ValueError):
        layout.zorder_sql("a", "b", bits=32)
    with pytest.raises(ValueError):
        layout.zorder_sql_n(["a"] * 4, bits=16)
