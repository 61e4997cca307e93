"""Deduplication operators (X1/X2; SURVEY §2.11) — exact, n-gram
Jaccard, MinHash+LSH, SimHash.

Scale posture (100 TB): every step is a relational program —
tokenize/shingle with higher-order functions (JVM-side), candidate
generation via band-bucket equi-joins (shuffle keyed on band hash, AQE
skew-join handles hot buckets), verification only on candidate pairs.
The O(n²) paths (full pairwise Jaccard) exist as correctness baselines
for small data; MinHash-LSH is the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, cols: list[str], tie_break: str) -> DataFrame:
    """X1: keep exactly one row per duplicate group, deterministically
    (the row with the smallest ``tie_break``) — unlike ``dropDuplicates``
    whose survivor is partition-order-dependent."""
    w = Window.partitionBy(*cols).orderBy(F.col(tie_break).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ------------------------------------------------------------- shingles

def words(text: Column) -> Column:
    """Whitespace tokens, with empty strings removed (deterministic for
    empty/trailing-space inputs)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != "")


def word_shingles(text: Column, n: int) -> Column:
    """n-word shingles as space-joined strings; [] when fewer than n
    words. n=1 → the token list itself."""
    w = words(text)
    if n == 1:
        return w
    count = F.size(w) - (n - 1)
    # sequence(1, 0) would yield a DESCENDING [1, 0], not [] — guard short docs.
    return F.when(
        count > 0,
        F.transform(
            F.sequence(F.lit(1), count), lambda i: F.concat_ws(" ", F.slice(w, i, n))
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_table(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct (id, shingle) pairs — the set representation both the
    exact-Jaccard and MinHash paths consume."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(word_shingles(F.col(text_col), n)).alias("shingle"))
        .distinct()
    )


# ----------------------------------------------------- exact n-gram Jaccard

def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """X2 baseline: all pairs with shingle-set Jaccard ≥ threshold.

    inter(a,b) via a self-equi-join on shingle (shuffle keyed on the
    shingle — skew on stop-shingles is the known hazard; the MinHash
    path avoids it). Output: id_a, id_b (a<b), jaccard (double division
    of exact ints → cross-engine deterministic).
    """
    sh = shingle_table(df, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(F.broadcast(sizes).alias("sa"), F.col("id_a") == F.col("sa.id"))
        .join(F.broadcast(sizes).alias("sb"), F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------ MinHash-LSH

def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 2, num_hashes: int = 32
) -> DataFrame:
    """MinHash signature per document: h_i = min over shingles of
    xxhash64(shingle, i). One groupBy with ``num_hashes`` min-aggregates
    (single shuffle, map-side partial aggregation)."""
    sh = shingle_table(df, id_col, text_col, n)
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("id").agg(*aggs)
    return sig.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(sig: DataFrame, bands: int = 8, rows_per_band: int = 4) -> DataFrame:
    """Band the signatures; docs sharing any band bucket are candidates.

    bucket key = xxhash64(band_id, slice of signature); candidates via a
    self-equi-join on (band, bucket) — the LSH trick that turns O(n²)
    into O(n·collisions)."""
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(b, F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)).alias(
                        "bucket"
                    ),
                ),
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    return (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """X2 scale path end-to-end: LSH candidates, then exact Jaccard
    verification *only on candidates*. Returns (id_a, id_b, jaccard)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    cand = lsh_candidate_pairs(sig, bands, rows_per_band)

    sh = shingle_table(df, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(sh.alias("sa"), cand.id_a == F.col("sa.id"))
        .join(
            sh.alias("sb"),
            (cand.id_b == F.col("sb.id")) & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(F.broadcast(sizes).alias("za"), F.col("id_a") == F.col("za.id"))
        .join(F.broadcast(sizes).alias("zb"), F.col("id_b") == F.col("zb.id"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter")
                / (F.col("za.n_sh") + F.col("zb.n_sh") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------- SimHash

def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """X2: 64-bit SimHash fingerprint per document.

    token hash → per-bit ±1 votes → sign → fingerprint, entirely with
    built-in functions: explode (token × bit) rows, two aggregations
    (bit votes, then bit_or of set bits). Heavier than a Pandas UDF per
    row but fully JVM-side and shuffle-partitioned; near-dup = pairs
    with small Hamming distance (see :func:`simhash_near_pairs`)."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(words(F.col(text_col))).alias("tok")
    ).withColumn("th", F.xxhash64("tok"))
    votes = (
        toks.select(
            "id",
            "th",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        )
        .withColumn(
            # SQL form: the Python F.shiftright only accepts an int shift
            "vote",
            F.expr("(shiftright(th, bit) & 1) * 2 - 1"),
        )
        .groupBy("id", "bit")
        .agg(F.sum("vote").alias("v"))
    )
    return (
        votes.withColumn(
            "bitval",
            F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        .groupBy("id")
        .agg(F.bit_or("bitval").alias("simhash"))
    )


def simhash_near_pairs(
    fp: DataFrame, max_hamming: int = 3, num_chunks: int | None = None
) -> DataFrame:
    """Chunked blocking (pigeonhole): split the 64-bit fingerprint into
    ``num_chunks`` chunks — any pair within Hamming distance < num_chunks
    shares at least one exact chunk, so blocking on (chunk_idx, chunk
    value) has guaranteed recall for max_hamming ≤ num_chunks - 1. Then
    verify with bit_count(xor). Returns (id_a, id_b, hamming)."""
    if num_chunks is None:
        num_chunks = min(max_hamming + 1, 8)
    chunk_bits = 64 // num_chunks
    mask = (1 << chunk_bits) - 1
    blocked = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftrightunsigned(F.col("simhash"), i * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk_val"),
                    )
                    for i in range(num_chunks)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", "c.chunk_idx", "c.chunk_val")
    return (
        blocked.alias("a")
        .join(blocked.alias("b"), ["chunk_idx", "chunk_val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
