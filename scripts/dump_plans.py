#!/usr/bin/env python
"""Dump ``explain("formatted")`` output for named queries to files.

Usage:
    python scripts/dump_plans.py --dir plans/r12 --suffix _before name...

Writes ``<dir>/<name><suffix>.txt`` per query. The plan is captured
BEFORE execution (AdaptiveSparkPlan isFinalPlan=false), which is the
static plan shape — Exchange placement, join strategy, PushedFilters,
ReadSchema, Python-eval nodes — that the optimization round's claims
are checked against.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asset_prices_parquet_saver_spark.plans import QUERIES  # noqa: E402
from asset_prices_parquet_saver_spark.session import get_spark  # noqa: E402


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(args.dir, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    for name in args.names:
        df = QUERIES[name](spark, sf_dir)
        path = os.path.join(args.dir, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(formatted_plan(df))
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
