#!/usr/bin/env python
"""Regenerate the pinned IVF coarse quantizer
(asset_prices_parquet_saver_spark/operators/ivf_centroids.py).

The production IVF workflow trains the quantizer ONCE on a corpus
sample and ships the centroids as an artifact (what FAISS persists in
its index files); queries and oracles then share the exact constants.
Run this after a testdata regeneration changes the embeddings table:

    python scripts/gen_ivf_centroids.py [sf_dir] [num_cells]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from asset_prices_parquet_saver_spark.operators.similarity import (  # noqa: E402
    _train_centroids,
)
from asset_prices_parquet_saver_spark.session import get_spark  # noqa: E402
from asset_prices_parquet_saver_spark.sources.tables import read_table  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "asset_prices_parquet_saver_spark",
    "operators",
    "ivf_centroids.py",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    num_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(app_name="gen-ivf-centroids")
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    C = _train_centroids(e, num_cells)
    with open(OUT, "w") as fh:
        fh.write(
            '"""Pinned IVF coarse quantizer — generated artifact.\n'
            "\n"
            f"Trained by scripts/gen_ivf_centroids.py on {sf_dir}/embeddings\n"
            "(deterministic k-means: hash-ordered sample, farthest-first\n"
            "init, Lloyd iterations — operators/similarity.py\n"
            "_train_centroids). repr() round-trips each float64 exactly, so\n"
            "the Spark kernels and any SQL oracle inlining these literals\n"
            "compute against bit-identical centroids.\n"
            '"""\n\n'
            f"PINNED_NUM_CELLS = {len(C)}\n"
            f"PINNED_DIM = {C.shape[1]}\n"
            "\n"
            "PINNED_IVF_CENTROIDS = [\n"
        )
        for row in C:
            fh.write("    [" + ", ".join(repr(float(x)) for x in row) + "],\n")
        fh.write("]\n")
    print(f"wrote {len(C)}x{C.shape[1]} centroids to {OUT}")


if __name__ == "__main__":
    main()
