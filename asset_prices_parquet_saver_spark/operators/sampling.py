"""Deterministic stratified sampling (training-data splits).

``DataFrame.sampleBy`` draws from an engine-specific seeded RNG: the
selected rows change across engines, Spark versions, and partitionings,
so a sampled dataset can never be re-derived or audited. For
training-data pipelines the standard practice is *hash bucketing*:
a row is in the f-sample iff ``hash(key) / 2^32 < f``. The sample is

- deterministic: same rows on every engine/run/partitioning,
- stable under appends: existing rows never flip in or out,
- uniform: md5 output bits are uniform in the key,
- cross-engine verifiable: md5 is bit-identical everywhere, so an
  oracle SQL reproduces the exact row set (not just its size).

The predicate compares the first 8 lowercase-hex chars of
``md5(key)`` lexicographically against ``hex(floor(f·2^32))`` — for
fixed-width lowercase hex, string order IS numeric order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket_hex(key: Column, width: int = 8) -> Column:
    """First ``width`` hex chars of md5(key-as-string)."""
    return F.substring(F.md5(key.cast("string")), 1, width)


def fraction_threshold_hex(fraction: float, width: int = 8) -> str:
    """``hex(floor(f·16^width))`` zero-padded to ``width`` chars."""
    return format(int(fraction * (16**width)), "x").zfill(width)


def stratified_sample(
    df: DataFrame, strata_col: str, key_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Keep a deterministic ``fractions[stratum]`` share of each stratum
    (strata absent from ``fractions`` are dropped, like ``sampleBy``)."""
    h = hash_bucket_hex(F.col(key_col))
    pred = F.lit(False)
    for stratum, frac in fractions.items():
        in_stratum = F.col(strata_col) == stratum
        if frac >= 1.0:
            pred = pred | in_stratum
        else:
            pred = pred | (in_stratum & (h < fraction_threshold_hex(frac)))
    return df.filter(pred)


def assign_split(key: Column, splits: list[tuple[str, float]]) -> Column:
    """Deterministic train/val/test assignment: label a row by which
    cumulative md5-bucket range its key hashes into. ``splits`` is
    ``[(label, fraction), ...]``; fractions must sum to ≤ 1 and the
    LAST label absorbs the remainder, so every row gets a label and
    the assignment is stable under appends (a new row never moves an
    old row between splits — the property ``randomSplit`` cannot
    give you, since its row assignment depends on partitioning).

    Both sides of the compare are zero-padded to 9 chars (the
    mix_to_proportions overflow rule): a CUMULATIVE fraction reaching
    exactly 1.0 yields the 9-hex-digit threshold 16^8 = '100000000',
    which against an unpadded 8-char hash would compare lexically
    ('8...' > '1...') and send the entire upper half of the keyspace
    to the fall-through label."""
    h = F.lpad(hash_bucket_hex(key), 9, "0")
    expr = F.lit(splits[-1][0])
    cum = 0.0
    cuts = []
    for label, frac in splits[:-1]:
        cum += frac
        cuts.append((label, fraction_threshold_hex(cum).zfill(9)))
    for label, thr in reversed(cuts):
        expr = F.when(h < F.lit(thr), F.lit(label)).otherwise(expr)
    return expr


def split_oracle_case(key_col: str, splits: list[tuple[str, float]]) -> str:
    """ANSI-SQL CASE mirroring :func:`assign_split` (same 9-char
    zero-padding so a cumulative fraction of exactly 1.0 compares
    numerically, see assign_split)."""
    h = f"lpad(substring(md5(CAST({key_col} AS VARCHAR)), 1, 8), 9, '0')"
    cum, whens = 0.0, []
    for label, frac in splits[:-1]:
        cum += frac
        thr = fraction_threshold_hex(cum).zfill(9)
        whens.append(f"WHEN {h} < '{thr}' THEN '{label}'")
    return f"CASE {' '.join(whens)} ELSE '{splits[-1][0]}' END"


#: md5-prefix width (hex chars) and its numeric range, shared by the
#: mixing threshold arithmetic on both engines
_MIX_RANGE = 4294967296  # 16^8


def mix_to_proportions(
    df: DataFrame, strata_col: str, key_col: str, targets: dict[str, int]
) -> DataFrame:
    """Deterministic corpus mixing: downsample each stratum so output
    proportions match integer-percent ``targets`` at the largest
    achievable total (strata not in ``targets`` are dropped).

    The per-stratum keep-thresholds are data-dependent, so they are
    computed IN THE PLAN with exact integer arithmetic (``div`` floor
    division; the one oversized product goes through DECIMAL(38)) —
    the SQL oracle reproduces the identical thresholds with HUGEINT
    ``//``, making the exact selected row set cross-engine
    reproducible. Formulas (n_s = stratum count, p_s = target pct):

    - budget  = min_s(n_s·100 div p_s)   (max total respecting targets)
    - k_s     = budget·p_s div 100       (per-stratum keep count)
    - thr_s   = k_s·16^8 div n_s         (md5-prefix keep threshold)

    A row survives iff its 8-char md5 prefix < thr_s (9-char zero-pad
    on both sides so a full-stratum threshold of exactly 16^8 — nine
    hex digits — still compares correctly). Thresholding keeps ~k_s
    rows (binomially tight), which is the right trade at scale: no
    per-stratum sort, no skew-prone shuffle, unlike an exact-k
    hash-ranked top-k per stratum.

    Execution: the per-stratum count relation is bounded by
    ``len(targets)`` — a constant — so it is collected (the repo's
    bounded-constant collect rule) and the thresholds are computed in
    Python arbitrary-precision integers (same floor-division algebra
    the oracle runs in HUGEINT, value-identical by construction) and
    inlined as literals. The mixing plan is then ONE aggregation job +
    ONE pure scan-and-filter job — no joins at all; the previous
    in-plan derivation chained three jobs through broadcast barriers
    and doubled the wall-clock."""
    counts_rows = (
        df.filter(F.col(strata_col).isin(*targets.keys()))
        .groupBy(strata_col)
        .agg(F.count("*").alias("n"))
        .collect()  # bounded: <= len(targets) rows
    )
    n_by = {r[strata_col]: r["n"] for r in counts_rows}
    present = {s: p for s, p in targets.items() if n_by.get(s)}
    if not present:
        return df.filter(F.lit(False))
    budget = min(n_by[s] * 100 // p for s, p in present.items())
    probe = F.lpad(hash_bucket_hex(F.col(key_col)), 9, "0")
    pred = F.lit(False)
    for s, p in present.items():
        k = budget * p // 100
        thr_hex = format(k * _MIX_RANGE // n_by[s], "x").zfill(9)
        pred = pred | ((F.col(strata_col) == s) & (probe < F.lit(thr_hex)))
    return df.filter(pred)


def mix_oracle_ctes(
    table: str, strata_col: str, key_col: str, targets: dict[str, int]
) -> tuple[str, str]:
    """(CTE block, WHERE-join tail) mirroring :func:`mix_to_proportions`
    in DuckDB SQL. Usage::

        ctes, tail = mix_oracle_ctes("documents", "lang", "doc_id", T)
        sql = f"{ctes} SELECT d.doc_id, d.lang FROM documents d {tail}"
    """
    values = ", ".join(f"('{s}', {int(p)})" for s, p in targets.items())
    ctes = f"""
    WITH tgt({strata_col}, pct) AS (VALUES {values}),
    cnt AS (
        SELECT d.{strata_col} AS s, t.pct AS pct, COUNT(*) AS n
        FROM {table} d JOIN tgt t ON d.{strata_col} = t.{strata_col}
        GROUP BY 1, 2
    ),
    b AS (SELECT MIN(n * 100 // pct) AS budget FROM cnt),
    thr AS (
        SELECT s,
               lpad(lower(to_hex(CAST(
                   (((SELECT budget FROM b) * pct // 100)::HUGEINT
                    * {_MIX_RANGE}) // n AS BIGINT))), 9, '0') AS thr_hex
        FROM cnt
    )"""
    tail = (
        f"JOIN thr ON d.{strata_col} = thr.s "
        f"WHERE lpad(substring(md5(CAST(d.{key_col} AS VARCHAR)), 1, 8), 9, '0')"
        f" < thr.thr_hex"
    )
    return ctes, tail


def sample_oracle_predicate(
    strata_col: str, key_col: str, fractions: dict[str, float]
) -> str:
    """The WHERE clause mirroring :func:`stratified_sample` in ANSI SQL
    (DuckDB's md5() matches Spark's bit for bit)."""
    clauses = []
    for stratum, frac in fractions.items():
        if frac >= 1.0:
            clauses.append(f"{strata_col} = '{stratum}'")
        else:
            thr = fraction_threshold_hex(frac)
            clauses.append(
                f"({strata_col} = '{stratum}' AND "
                f"substring(md5(CAST({key_col} AS VARCHAR)), 1, 8) < '{thr}')"
            )
    return " OR ".join(clauses)


def exact_k_stratified_sample(
    df: DataFrame, strata_col: str, key_col: str, k: int
) -> DataFrame:
    """EXACTLY k rows per stratum (fewer only if the stratum is
    smaller), chosen as the k smallest md5 buckets — deterministic,
    engine-independent, and stable in membership-by-rank. The
    eval-set constructor: hash *thresholding* (stratified_sample /
    mix_to_proportions) keeps ~fraction·n rows and is the right scale
    trade for training mixes, but benchmark/eval sets need an exact
    count.

    Scale: one shuffle keyed on the stratum + a per-stratum rank
    window. Ranking sorts each stratum's partition — fine for the
    eval-set use case (strata bounded); for exact-k over a huge
    stratum, compose a hash-threshold pre-filter at ~2k/n to bound
    the sorted set first."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket_hex(F.col(key_col)).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def weighted_stratified_sample(
    df,
    strata_cols: list[str],
    key_col: str,
    weight_col: str,
    k: int,
):
    """Deterministic WEIGHTED top-k per stratum (Efraimidis-Spirakis
    A-ES, derandomized): u = (h60(key)+1)/2^60 ∈ (0,1] from the
    engine-portable md5 family, selection key = ln(u)/weight — taking
    the k largest per stratum draws each row with probability
    proportional to its weight, yet the sample is a pure function of
    the keys (append-stable, auditable, reproducible on any engine).
    The key rounds to 9 decimals before ranking (absorbs libm ulp
    differences between engines) with the id as tie-break, so the
    selected SET is engine-exact. Zero/negative weights are excluded.

    Scale shape: one narrow map for the key, one rank window per
    stratum — the same cost as the uniform exact-k sampler."""
    from pyspark.sql import Window

    from asset_prices_parquet_saver_spark.functions import portable_hash as ph

    u = (ph.md5_int60(F.col(key_col).cast("string")) + 1) / F.lit(float(1 << 60))
    es = F.round(F.log(u) / F.col(weight_col), 9)
    w = Window.partitionBy(*strata_cols).orderBy(
        F.col("es_key").desc(), F.col(key_col).asc()
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("es_key", es)
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


def contrastive_negatives(
    df: DataFrame, id_col: str, k: int = 4
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every anchor row, up to ``k`` pseudo-random corpus negatives drawn
    by portable md5 indexing — neg_j(anchor) = corpus[md5(anchor ':' j)
    mod N] — so the sample is reproducible across engines, runs, and
    partitionings (no RNG state, the exact_k/weighted-sample md5-key
    discipline). Self-hits are dropped rather than re-drawn (an anchor
    keeps k-1 negatives in that ~k/N-probability case), keeping the
    definition join-free to replay. Returns (anchor_id, neg_rank,
    neg_id).

    Scale shape: the corpus is indexed 0..N-1 with the distributed
    range-partitioned row numbering (operators/globalorder.py — no
    single-task window); anchors fan out to k rows each and resolve
    negatives with ONE equi-join on the index — O(N·k) shuffle, no
    corpus×corpus anything; N is a 1-row broadcast."""
    from asset_prices_parquet_saver_spark.functions.hints import bounded_broadcast
    from asset_prices_parquet_saver_spark.functions.portable_hash import md5_int60
    from asset_prices_parquet_saver_spark.operators.globalorder import (
        with_global_row_number,
    )

    ids = with_global_row_number(
        df.select(F.col(id_col).alias("neg_id")), [F.col("neg_id")]
    ).select((F.col("rn") - 1).alias("idx"), "neg_id")
    tot = df.agg(F.count("*").alias("n"))
    negs = (
        df.select(F.col(id_col).alias("anchor_id"))
        .select(
            "anchor_id",
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_rank"),
        )
        .crossJoin(bounded_broadcast(tot))
        .select(
            "anchor_id",
            F.col("neg_rank").cast("long").alias("neg_rank"),
            F.pmod(
                md5_int60(
                    F.concat_ws(
                        ":",
                        F.col("anchor_id").cast("string"),
                        F.col("neg_rank").cast("string"),
                    )
                ),
                F.col("n"),
            ).alias("idx"),
        )
    )
    return (
        negs.join(ids, "idx")
        .filter(F.col("neg_id") != F.col("anchor_id"))
        .select("anchor_id", "neg_rank", "neg_id")
    )


def k_anonymous(df: DataFrame, cols: list[str], k: int) -> DataFrame:
    """Rows whose quasi-identifier combination is shared by at least
    ``k`` rows — k-anonymity suppression (Sweeney 2002), the release
    screen a training-data pipeline runs on metadata columns before
    publication: any combination rare enough to re-identify its
    members is dropped entirely.

    Scale shape: one map-side-combinable count on the combo key and a
    semi-join back — no window over the corpus, no skew hazard (hot
    combos are by definition the SAFE ones)."""
    if k < 1:
        raise ValueError(f"k_anonymous: k must be >= 1, got {k}")
    safe = (
        df.groupBy(*cols)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= k)
        .drop("_n")
    )
    # a USING-style semi join moves the key columns first; restore the
    # input's column order (callers and the oracle see df's schema)
    return df.join(safe, cols, "left_semi").select(*df.columns)


def temperature_mix_weights(
    df: DataFrame, group_col: str, alpha: float
) -> DataFrame:
    """Temperature-scaled sampling weights per slice: w_s ∝ p_s^alpha
    with p_s the slice's share of the corpus — the multilingual-LM
    rebalancing rule (alpha < 1 upweights small slices; alpha = 1 is
    natural sampling, alpha = 0 uniform). Returns (group, n_rows,
    weight), weight rounded to 6 decimals and summing to ~1.

    Scale shape: one combinable count per slice; the normalization
    constant is a 1-row broadcast — nothing else touches the corpus."""
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").cast("long").alias("n_rows")
    )
    powed = counts.withColumn(
        "_pw", F.pow(F.col("n_rows").cast("double"), F.lit(float(alpha)))
    )
    z = powed.agg(F.sum("_pw").alias("_z"))
    return (
        powed.crossJoin(F.broadcast(z))
        .select(
            "grp",
            "n_rows",
            F.round(F.col("_pw") / F.col("_z"), 6).alias("weight"),
        )
    )
