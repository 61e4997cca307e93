"""Similarity search over embeddings (X3; SURVEY §2.11).

Brute-force cosine top-k is the correctness baseline (query side
broadcast → no shuffle of the big side; the window top-k shuffles only
(query_id, candidates)). The LSH-bucketed variant is the scale path: at
100 TB the corpus side is hash-bucketed by sign-pattern so each query
only scans its bucket's candidates.

All vector math is JVM-side higher-order functions
(functions.vectors) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.functions.vectors import (
    cosine_similarity,
    dot,
    norm,
    to_double_array,
)


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 6,
) -> DataFrame:
    """Exact top-k nearest corpus vectors per query vector by cosine.

    Output: query_id, vec_id, cosine (rounded), rank. Rank is computed
    on the *rounded* similarity with id tie-break, so the result set is
    deterministic across engines and partitionings.
    """
    e = emb.select(
        F.col(id_col).alias("vec_id"), to_double_array(vec_col).alias("v")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_similarity(F.col("qv"), F.col("v")), round_decimals).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 6,
) -> DataFrame:
    """Embedding near-duplicate pairs: all (a<b) with cosine ≥ threshold.

    O(n²) verification baseline; use :func:`ann_lsh_topk`'s bucketing at
    scale. Norms are precomputed once per side to halve the flops."""
    e = emb.select(
        F.col(id_col).alias("id"), to_double_array(vec_col).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    pairs = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")),
                round_decimals,
            ).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= threshold)


def _plane_weight(plane: int, dim_idx: Column) -> Column:
    """Deterministic pseudo-random hyperplane weight in [-1, 1]:
    hash-derived from (plane, dimension index) — reproducible across
    runs/cluster sizes with no driver-side RNG state."""
    h = F.xxhash64(F.lit(plane), dim_idx)
    return (F.pmod(h, F.lit(2001)).cast("double") - 1000.0) / 1000.0


def _weighted_elem(p: int):
    # closure factory: a default arg would change the lambda arity and
    # break zip_with's 2-argument lambda binding
    return lambda x, i: x * _plane_weight(p, i)


def lsh_bucket(vec: Column, num_planes: int = 8, table: int = 0) -> Column:
    """Sign-pattern bucket id (random-hyperplane LSH) of an
    array<double> vector within one hash table: bit p = sign(v · plane_p).
    Distinct ``table`` values derive independent plane sets."""
    idx = F.transform(F.sequence(F.lit(0), F.size(vec) - 1), lambda i: i)
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        proj = F.aggregate(
            F.zip_with(vec, idx, _weighted_elem(table * 10_007 + p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def _with_buckets(df: DataFrame, vec: str, num_planes: int, num_tables: int) -> DataFrame:
    """Explode each vector into (table, bucket) rows — one per hash table."""
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                lsh_bucket(F.col(vec), num_planes, t).alias("bucket"),
            )
            for t in range(num_tables)
        ]
    )
    return df.select("*", F.explode(buckets).alias("tb")).select(
        *df.columns, "tb.table", "tb.bucket"
    )


def ann_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH.

    Candidates = corpus vectors sharing the query's bucket in ANY of the
    ``num_tables`` independent tables (union → distinct), reranked by
    exact cosine. Per-query work ≈ num_tables · n / 2^num_planes; recall
    grows with num_tables — the standard recall/cost dial. Corpus side
    shuffles on (table, bucket); queries broadcast."""
    e = _with_buckets(
        emb.select(F.col(id_col).alias("vec_id"), to_double_array(vec_col).alias("v")),
        "v",
        num_planes,
        num_tables,
    )
    q = _with_buckets(
        queries.select(
            F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("qv")
        ),
        "qv",
        num_planes,
        num_tables,
    )
    cand = (
        e.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qv", "vec_id", "v")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(cosine_similarity(F.col("qv"), F.col("v")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
