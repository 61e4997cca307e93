#!/usr/bin/env python
"""Sweep headline queries' STATIC plans for duplicated corpus work.

For each named query (default: every bench HEADLINE entry) this builds
the DataFrame (no execution) and counts, in the formatted physical
plan: parquet scans per input table, Python-eval nodes (MapInPandas /
ArrowEvalPython / BatchEvalPython), total Exchanges, and
ReusedExchange nodes. A table scanned N times, or a kernel appearing
N times, with no matching Reused* node is a duplicated-subtree
suspect (guide §1.2 / §2.4). Diagnostic tooling only.

Usage:
    python scripts/plan_dup_scan.py [--min-dup N] [name ...]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asset_prices_parquet_saver_spark.plans import QUERIES  # noqa: E402
from asset_prices_parquet_saver_spark.session import get_spark  # noqa: E402

from bench import HEADLINE  # noqa: E402
from scripts.dump_plans import formatted_plan  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-dup", type=int, default=2)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan-dup-scan")
    rows = []
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as exc:  # write-path gates may mutate state
            print(f"{name}: SKIP ({type(exc).__name__})", file=sys.stderr)
            continue
        scans: dict[str, int] = {}
        for m in re.finditer(r"Scan parquet[^\n]*\[([^\]]*)\]|Location[^\n]*/(\w+)\.parquet", plan):
            pass
        # count scans by the file token in the Location line
        for m in re.finditer(r"Location: InMemoryFileIndex[^\n]*[/\[]([A-Za-z0-9_.-]+)\.parquet", plan):
            t = m.group(1)
            scans[t] = scans.get(t, 0) + 1
        kernels = len(re.findall(r"\bMapInPandas\b|\bArrowEvalPython\b|\bBatchEvalPython\b", plan))
        exch = len(re.findall(r"^\s*[:+\- ]*(?:\+- |:- )?Exchange ", plan, re.M))
        reused = len(re.findall(r"ReusedExchange", plan))
        rdd_scans: dict[str, int] = {}
        for m in re.finditer(r"Scan ExistingRDD[^\n]*MapPartitionsRDD\[(\d+)\]", plan):
            rdd_scans[m.group(1)] = rdd_scans.get(m.group(1), 0) + 1
        dup_tables = {t: c for t, c in scans.items() if c >= args.min_dup}
        flag = "DUP" if (dup_tables or kernels >= args.min_dup) else "   "
        rows.append((name, dup_tables, kernels, exch, reused, rdd_scans))
        print(
            f"{flag} {name:35s} kernels={kernels:<2} exch={exch:<3} "
            f"reused={reused:<2} dup_scans={dup_tables}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
