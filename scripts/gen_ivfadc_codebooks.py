#!/usr/bin/env python
"""Regenerate the pinned IVFADC residual codebooks
(asset_prices_parquet_saver_spark/operators/pq_res_codebooks.py).

IVFADC quantizes RESIDUALS x − c_cell (Jégou et al. 2011), so its
codebooks are trained on the residual distribution induced by the
pinned IVF coarse quantizer. Run after a testdata regeneration (after
gen_ivf_centroids.py, which it depends on):

    python scripts/gen_ivfadc_codebooks.py [sf_dir] [num_subq] [num_codes]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from asset_prices_parquet_saver_spark.operators.ivf_centroids import (  # noqa: E402
    PINNED_IVF_CENTROIDS,
)
from asset_prices_parquet_saver_spark.operators.similarity import (  # noqa: E402
    _ivf_cells,
    _ivf_residuals,
    train_pq_codebooks,
)
from asset_prices_parquet_saver_spark.session import get_spark  # noqa: E402
from asset_prices_parquet_saver_spark.sources.tables import read_table  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "asset_prices_parquet_saver_spark",
    "operators",
    "pq_res_codebooks.py",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    num_subq = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    num_codes = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark(app_name="gen-ivfadc-codebooks")
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    Cn = np.asarray(PINNED_IVF_CENTROIDS, dtype="float64")
    res = _ivf_residuals(_ivf_cells(e, Cn, 1), Cn).select("vec_id", "v")
    B = train_pq_codebooks(res, num_subq, num_codes)
    m, ksub, dsub = B.shape
    with open(OUT, "w") as fh:
        fh.write(
            '"""Pinned IVFADC residual codebooks — generated artifact.\n'
            "\n"
            f"Trained by scripts/gen_ivfadc_codebooks.py on {sf_dir}/embeddings\n"
            "residuals against the pinned IVF coarse quantizer\n"
            "(operators/ivf_centroids.py). repr() round-trips each float64\n"
            "exactly, so the Spark ADC kernel and any SQL oracle inlining\n"
            "these literals quantize against bit-identical codebooks.\n"
            '"""\n\n'
            f"PINNED_RES_M = {m}\n"
            f"PINNED_RES_KSUB = {ksub}\n"
            f"PINNED_RES_DSUB = {dsub}\n"
            "\n"
            "#: [subquantizer][code] -> residual centroid (len PINNED_RES_DSUB)\n"
            "PINNED_RES_CODEBOOKS = [\n"
        )
        for j in range(m):
            fh.write("    [\n")
            for row in B[j]:
                fh.write(
                    "        [" + ", ".join(repr(float(x)) for x in row) + "],\n"
                )
            fh.write("    ],\n")
        fh.write("]\n")
    print(f"wrote {m}x{ksub}x{dsub} residual codebooks to {OUT}")


if __name__ == "__main__":
    main()
