#!/usr/bin/env python
"""Regenerate the pinned PCA basis
(asset_prices_parquet_saver_spark/operators/pca_components.py).

Production embedding pipelines train dimensionality reduction ONCE on
a corpus sample and ship the basis as an artifact (exactly what FAISS
persists for its PCAMatrix / OPQ pre-transforms); projection is then a
pure matmul against pinned constants on any engine. Run this after a
testdata regeneration changes the embeddings table:

    python scripts/gen_pca_components.py [sf_dir] [num_components]

Training is deterministic end to end: the sample is the ``sample_cap``
vectors with the smallest xxhash64(vec_id) (the same distributed
TakeOrdered idiom as gen_ivf_centroids), covariance/eigh run in
float64 numpy, components order by descending eigenvalue, and each
component's sign is fixed so its largest-|coefficient| coordinate is
positive (eigenvectors are sign-ambiguous; without the convention a
rebuild could flip every score).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from asset_prices_parquet_saver_spark.session import get_spark  # noqa: E402
from asset_prices_parquet_saver_spark.sources.tables import read_table  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "asset_prices_parquet_saver_spark",
    "operators",
    "pca_components.py",
)

SAMPLE_CAP = 4096


def main() -> None:
    import numpy as np

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="gen-pca-components")
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    rows = (
        e.orderBy(F.xxhash64(F.col("vec_id")).asc(), F.col("vec_id").asc())
        .limit(SAMPLE_CAP)
        .collect()
    )
    X = np.array([r.v for r in rows], dtype=np.float64)
    mean = X.mean(axis=0)
    cov = np.cov(X - mean, rowvar=False)  # sample covariance, (d, d)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps, expl = [], []
    for idx in order:
        c = evecs[:, idx]
        if c[int(np.argmax(np.abs(c)))] < 0:
            c = -c
        comps.append(c)
        expl.append(float(evals[idx]))

    with open(OUT, "w") as fh:
        fh.write(
            '"""Pinned PCA basis — generated artifact.\n'
            "\n"
            f"Trained by scripts/gen_pca_components.py on {sf_dir}/embeddings\n"
            f"(deterministic hash-ordered {SAMPLE_CAP}-cap sample, float64\n"
            "covariance + eigh, descending eigenvalue order, sign fixed at\n"
            "the largest-|coefficient| coordinate). repr() round-trips each\n"
            "float64 exactly, so the Spark kernel and any SQL oracle\n"
            "inlining these literals project against bit-identical\n"
            'constants.\n"""\n\n'
            f"PINNED_PCA_DIM = {X.shape[1]}\n"
            f"PINNED_PCA_K = {len(comps)}\n"
            "\n"
            f"PINNED_PCA_MEAN = {[float(x) for x in mean]!r}\n"
            "\n"
            f"PINNED_PCA_EXPLAINED_VAR = {expl!r}\n"
            "\n"
            "PINNED_PCA_COMPONENTS = [\n"
        )
        for c in comps:
            fh.write(f"    {[float(x) for x in c]!r},\n")
        fh.write("]\n")
    print(f"wrote {OUT}: k={len(comps)} dim={X.shape[1]}")


if __name__ == "__main__":
    main()
