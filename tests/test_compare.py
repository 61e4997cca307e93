

# ---------------------------------------------------------------------
# fk_report: referential-integrity profile
# ---------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from asset_prices_parquet_saver_spark.operators.compare import (  # noqa: E402
    fk_report,
)


def test_fk_report_orphans_unreferenced_and_null_keys(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (None,)], "fk INT"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk INT")
    row = fk_report(child, "fk", parent, "pk", "c->p").collect()[0]
    assert row.relationship == "c->p"
    assert row.child_rows == 5
    assert row.child_keys == 4  # 1, 2, 9, NULL
    # orphans: the 9 (no parent) and the NULL (references nothing)
    assert row.orphan_child_rows == 2
    assert row.unreferenced_parents == 1  # parent 3 never used


def test_fk_report_clean_relationship(spark):
    child = spark.createDataFrame([(1,), (2,)], "fk INT")
    parent = spark.createDataFrame([(1,), (2,)], "pk INT")
    row = fk_report(child, "fk", parent, "pk", "ok").collect()[0]
    assert (row.orphan_child_rows, row.unreferenced_parents) == (0, 0)
