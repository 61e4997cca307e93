#!/usr/bin/env python
"""Regenerate the pinned PQ codebooks
(asset_prices_parquet_saver_spark/operators/pq_codebooks.py).

Same persist-the-quantizer workflow as gen_ivf_centroids.py: the PQ
codebooks are trained ONCE on a corpus sample (deterministic
per-subspace L2 k-means — operators/similarity.train_pq_codebooks) and
shipped as a float64-literal artifact that the Spark kernel and the SQL
oracle both consume. Run after a testdata regeneration changes the
embeddings table:

    python scripts/gen_pq_codebooks.py [sf_dir] [num_subq] [num_codes]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from asset_prices_parquet_saver_spark.operators.similarity import (  # noqa: E402
    train_pq_codebooks,
)
from asset_prices_parquet_saver_spark.session import get_spark  # noqa: E402
from asset_prices_parquet_saver_spark.sources.tables import read_table  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "asset_prices_parquet_saver_spark",
    "operators",
    "pq_codebooks.py",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    num_subq = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    num_codes = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = get_spark(app_name="gen-pq-codebooks")
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    B = train_pq_codebooks(e, num_subq, num_codes)
    m, ksub, dsub = B.shape
    with open(OUT, "w") as fh:
        fh.write(
            '"""Pinned PQ codebooks — generated artifact.\n'
            "\n"
            f"Trained by scripts/gen_pq_codebooks.py on {sf_dir}/embeddings\n"
            "(deterministic per-subspace L2 k-means —\n"
            "operators/similarity.train_pq_codebooks). repr() round-trips\n"
            "each float64 exactly, so the Spark ADC kernel and any SQL\n"
            "oracle inlining these literals quantize against bit-identical\n"
            "codebooks.\n"
            '"""\n\n'
            f"PINNED_PQ_M = {m}\n"
            f"PINNED_PQ_KSUB = {ksub}\n"
            f"PINNED_PQ_DSUB = {dsub}\n"
            "\n"
            "#: [subquantizer][code] -> centroid (len PINNED_PQ_DSUB)\n"
            "PINNED_PQ_CODEBOOKS = [\n"
        )
        for j in range(m):
            fh.write("    [\n")
            for row in B[j]:
                fh.write(
                    "        [" + ", ".join(repr(float(x)) for x in row) + "],\n"
                )
            fh.write("    ],\n")
        fh.write("]\n")
    print(f"wrote {m}x{ksub}x{dsub} codebooks to {OUT}")


if __name__ == "__main__":
    main()
