"""Randomized exactness check for the filtered Jaccard pipeline.

jaccard_pairs prunes candidates with three filters (prefix, positional,
k-prefix count — see operators/dedup.py). Each must be *sound*: no
qualifying pair may ever be dropped. This test compares the full
pipeline against a brute-force pure-Python computation over random
corpora drawn from a tiny vocabulary (maximizing shingle collisions,
the stress case for the filters) across several thresholds.
"""

from __future__ import annotations

import random

from pyspark.sql import Row

from asset_prices_parquet_saver_spark.operators import dedup


def _python_jaccard_pairs(texts, n, threshold):
    def shingles(t):
        w = t.split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    sets = {i: shingles(t) for i, t in enumerate(texts)}
    out = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                j = inter / union
                if j >= threshold:
                    out[(a, b)] = round(j, 9)
    return out


def test_filtered_jaccard_matches_bruteforce(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab → heavy collisions
    texts = []
    for _ in range(40):
        length = rng.randint(2, 14)
        texts.append(" ".join(rng.choice(vocab) for _ in range(length)))
    # plant near-duplicates: copies with small edits
    for i in (0, 5, 9):
        words = texts[i].split()
        words[rng.randrange(len(words))] = rng.choice(vocab)
        texts.append(" ".join(words))
    texts.append(texts[3])  # exact duplicate

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    # every physical strategy must produce the identical logical result
    # (auto would pick dense here — force each explicitly); the prefix
    # path runs with and without the PPJoin+ suffix filter
    for strategy, sfx in (("prefix", True), ("prefix", False), ("dense", True)):
        for threshold in (0.3, 0.5, 0.8):
            expected = _python_jaccard_pairs(texts, 2, threshold)
            got = {
                (r.id_a, r.id_b): round(r.jaccard, 9)
                for r in dedup.jaccard_pairs(
                    df, "doc_id", "text", 2, threshold,
                    strategy=strategy, suffix_filter=sfx,
                ).collect()
            }
            assert got == expected, (
                f"strategy={strategy} suffix={sfx} t={threshold}: "
                f"missing={set(expected) - set(got)} "
                f"extra={set(got) - set(expected)}"
            )


def test_dense_strategy_rejects_large_vocab(spark):
    import pytest

    # 60 docs of disjoint words -> vocabulary far above the limit
    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(f"u{i}_{j}" for j in range(10)))
         for i in range(60)]
    )
    with pytest.raises(ValueError, match="vocabulary"):
        dedup.jaccard_pairs(
            df, "doc_id", "text", 2, 0.5, strategy="dense",
            dense_vocab_limit=100,
        ).collect()


def test_suffix_filter_prunes_candidates_and_stays_exact(spark):
    """PPJoin+ depth-1 suffix filter A/B: cross-stratum doc pairs share
    only a rare 'bridge' shingle (a prefix hit with a huge positional
    bound), so only the suffix sketches can prune them. The filter must
    cut the candidate count while the verified output stays identical."""
    rng = random.Random(11)
    rows = []
    doc_sets = {}
    did = 0
    # 6 frequency strata with disjoint rank ranges; docs within a
    # stratum are near-dups of a template, cross-stratum pairs share
    # only the bridge ranks at the array head
    for g in range(6):
        base = sorted(rng.sample(range(1000 + g * 2000, 2600 + g * 2000), 60))
        for _ in range(12):
            body = sorted(
                set(base)
                - set(rng.sample(base, 6))
                | {rng.randrange(1000 + g * 2000, 2600 + g * 2000) for _ in range(3)}
            )
            arr = [1, 2] + [r for r in body if r > 6]  # shared bridges
            doc_sets[did] = set(arr)
            rows.append((did, arr, len(arr)))
            did += 1
    arrs = spark.createDataFrame(rows, "id long, arr array<long>, n_sh int")

    on = dedup._prefix_candidates(arrs, 0.5, suffix_filter=True)
    off = dedup._prefix_candidates(arrs, 0.5, suffix_filter=False)
    n_on, n_off = on.count(), off.count()
    assert n_on < n_off, (n_on, n_off)  # measurably fewer candidates
    assert n_off - n_on >= 0.2 * n_off, (n_on, n_off)

    # soundness: both candidate sets verify to the same exact pairs,
    # equal to brute force over the sets
    expected = {}
    ids = sorted(doc_sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = doc_sets[a], doc_sets[b]
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.5:
                expected[(a, b)] = round(j, 9)
    for cand in (on, off):
        got = {
            (r.id_a, r.id_b): round(r.jaccard, 9)
            for r in dedup._verified_jaccard(cand, arrs, 0.5).collect()
        }
        assert got == expected


def _python_containment_pairs(texts, n, threshold):
    def shingles(t):
        w = t.split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    sets = {i: shingles(t) for i, t in enumerate(texts)}
    out = {}
    for a in sets:
        for b in sets:
            if a != b and sets[a] and sets[b]:
                c = round(len(sets[a] & sets[b]) / len(sets[a]), 6)
                if c >= threshold:
                    out[(a, b)] = c
    return out


def test_containment_pairs_match_bruteforce(spark):
    """The asymmetric prefix filter is SOUND and exact: every ordered
    pair with containment >= t survives, nothing else does — against a
    randomized small-vocab corpus with planted snippets (small docs
    fully contained in big ones, the case Jaccard misses)."""
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(15)]
    texts = []
    for _ in range(30):
        length = rng.randint(3, 16)
        texts.append(" ".join(rng.choice(vocab) for _ in range(length)))
    # plant snippets: contiguous slices of longer docs (containment 1.0
    # against their source, low Jaccard)
    for i in (1, 4, 8):
        w = texts[i].split()
        if len(w) >= 6:
            texts.append(" ".join(w[1:5]))
    texts.append(texts[2])  # exact duplicate (containment both ways)

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    for threshold in (0.5, 0.7, 0.9):
        expected = _python_containment_pairs(texts, 2, threshold)
        got = {
            (r.id_a, r.id_b): round(r.containment, 6)
            for r in dedup.containment_pairs(
                df, "doc_id", "text", n=2, threshold=threshold
            ).collect()
        }
        assert got == expected, (
            f"t={threshold}: missing={set(expected) - set(got)} "
            f"extra={set(got) - set(expected)}"
        )
