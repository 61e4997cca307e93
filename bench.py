#!/usr/bin/env python
"""Benchmark runner (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed as a count-collapsed action (materializes the
full result without driver-side row transfer). A warmup query first
amortizes JVM/codegen startup out of the per-query numbers.

Noise discipline: this host's throughput oscillates 5-10x between
windows (VM migration churn), so each query is timed as the MEDIAN of
3 back-to-back runs — same-minute A/B, per NOTES.md. The O(n^2)
exact baseline ``embedding_near_pairs`` is deliberately NOT a headline
entry: it exists as the oracle anchor for the LSH scale path
(``embedding_near_pairs_lsh``), which is what a user should run and
what this bench grades.
"""

from __future__ import annotations

import json
import os
import re
import time

from asset_prices_parquet_saver_spark.plans import QUERIES
from asset_prices_parquet_saver_spark.session import get_spark

HEADLINE = [
    "flagship_pricing_summary",
    "filter_project_compute",
    "region_revenue",
    "top_building_orders",
    "upsert_keep_latest_per_day",
    "topk_orders_per_customer",
    "asof_last_purchase",
    "asof_price_lookup",
    "user_sessions",
    "session_window_bars",
    "daily_rollup",
    "source_diff",
    "dedup_exact_documents",
    "fuzzy_dedup_documents",
    "curated_corpus",
    "jaccard_near_dup_pairs",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "simhash_near_dup_pairs",
    "text_quality_stats",
    "language_id",
    "document_fingerprints",
    "tfidf_top_terms",
    "pack_training_shards",
    "benchmark_contamination",
    "repetition_stats",
    "top_ngrams",
    "cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "media_decode_meta",
    "media_frame_sample",
    "media_features",
    "parse_error_message",
    "value_dispersion_stats",
    "string_functions",
    "date_arithmetic",
    "conditional_agg",
    "cube_order_stats",
    "ntile_price_bands",
    "event_type_journey",
    "embedding_near_pairs_lsh",
    "semantic_dedup_embeddings",
    "above_avg_parts",
    "null_handling",
    "rank_functions",
    "argmax_per_nation",
    "approx_user_stats",
    "nation_trade_volume",
    "zscore_per_segment",
    "weighted_avg_price",
    "stratified_event_sample",
    "category_universe",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark(app_name="bench")

    # Warmup: JVM + codegen + parquet footer caches, then a mapInPandas
    # pass so the python worker pool (one interpreter per core, each
    # importing pandas/numpy) is already spawned before anything is
    # timed — cold worker fan-out otherwise lands on the first
    # Pandas-UDF query and dominates its number.
    QUERIES["flagship_pricing_summary"](spark, sf_dir).count()
    QUERIES["embedding_near_pairs_lsh"](spark, sf_dir).count()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
            # one long run is a property of the query, not the host
            # weather — don't pay 3x for the tail entries
            if samples[-1] > 30.0:
                break
        timings[name] = round(sorted(samples)[len(samples) // 2], 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
