"""Randomized exactness checks for the substring-dedup pipeline.

duplicated_spans composes a hashed-window kernel, a min≠max-id
duplicate rule, and a gaps-and-islands span merge; each stage must be
exact. This compares the full pipeline (and the excision write-path)
against a brute-force pure-Python reference over random corpora drawn
from a tiny vocabulary — the maximal-collision stress case for window
matching and island merging.
"""

from __future__ import annotations

import random

from pyspark.sql import Row

from asset_prices_parquet_saver_spark.operators import dedup


def _python_spans(texts, k):
    """Brute force: duplicated windows by exact gram equality across
    >= 2 distinct docs, merged into maximal spans per doc."""
    grams: dict[str, set[int]] = {}
    toks = {i: t.split() for i, t in enumerate(texts)}
    for i, w in toks.items():
        for p in range(len(w) - k + 1):
            grams.setdefault(" ".join(w[p : p + k]), set()).add(i)
    spans = {}
    for i, w in toks.items():
        hits = sorted(
            p + 1
            for p in range(len(w) - k + 1)
            if len(grams[" ".join(w[p : p + k])]) >= 2
        )
        merged = []
        for pos in hits:
            end = pos + k - 1
            if merged and pos <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], end))
            else:
                merged.append((pos, end))
        for s, e in merged:
            spans[(i, s)] = (e, e - s + 1)
    return spans


def _python_excise(texts, k):
    spans = _python_spans(texts, k)
    out = {}
    for i, t in enumerate(texts):
        w = t.split()
        drop = set()
        for (j, s), (e, _) in spans.items():
            if j == i:
                drop.update(range(s, e + 1))
        if drop:
            kept = [tok for p, tok in enumerate(w, start=1) if p not in drop]
            out[i] = (" ".join(kept), len(w), len(w) - len(kept))
    return out


def _random_corpus(seed):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(8)]  # tiny vocab → heavy collisions
    texts = []
    for _ in range(30):
        length = rng.randint(1, 20)
        texts.append(" ".join(rng.choice(vocab) for _ in range(length)))
    # plant verbatim runs shared across docs at different offsets
    run = " ".join(rng.choice(vocab) for _ in range(7))
    texts.append(run + " unique1 tail")
    texts.append("head unique2 " + run)
    texts.append(texts[4])  # full-document duplicate
    return texts


def test_duplicated_spans_matches_bruteforce(spark):
    for seed in (3, 11, 42):
        texts = _random_corpus(seed)
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
        for k in (3, 5):
            got = {
                (r.id, r.span_start): (r.span_end, r.span_tokens)
                for r in dedup.duplicated_spans(df, "doc_id", "text", k=k).collect()
            }
            want = _python_spans(texts, k)
            assert got == want, (seed, k)
            assert want, "fixture must contain duplicated spans"


def test_excision_matches_bruteforce(spark):
    texts = _random_corpus(99)
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        r.id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in dedup.excise_duplicated_spans(df, "doc_id", "text", k=5).collect()
    }
    assert got == _python_excise(texts, 5)
    assert got


def test_spans_partition_invariant(spark):
    texts = _random_corpus(7)
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    a = sorted(
        map(tuple, dedup.duplicated_spans(df, "doc_id", "text", k=4).collect())
    )
    b = sorted(
        map(
            tuple,
            dedup.duplicated_spans(
                df.repartition(13), "doc_id", "text", k=4
            ).collect(),
        )
    )
    assert a == b


def test_dsir_weights_match_python_reference(spark):
    """dsir_log_weights vs a brute-force Python reference: identical
    md5 bucketing, Laplace smoothing, and log-likelihood-ratio fold."""
    import math

    from asset_prices_parquet_saver_spark.functions.portable_hash import (
        py_md5_int60,
    )
    from asset_prices_parquet_saver_spark.operators import text
    from pyspark.sql import functions as F

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(10)]
    rows = []
    for i in range(40):
        length = rng.randint(1, 15)
        rows.append(
            (i, " ".join(rng.choice(vocab) for _ in range(length)), i % 3 == 0)
        )
    B = 64

    def feats(t):
        w = t.split()
        out = {}
        for g in w + [f"{a} {b}" for a, b in zip(w, w[1:])]:
            b = py_md5_int60(g) % B
            out[b] = out.get(b, 0) + 1
        return out

    rc: dict[int, int] = {}
    tc: dict[int, int] = {}
    per_doc = {}
    for i, t, tgt in rows:
        f = feats(t)
        if f:
            per_doc[i] = f
        for b, c in f.items():
            rc[b] = rc.get(b, 0) + c
            if tgt:
                tc[b] = tc.get(b, 0) + c
    tr, tt = sum(rc.values()), sum(tc.values())
    want = {}
    for i, f in per_doc.items():
        lw = sum(
            c
            * (
                math.log((tc.get(b, 0) + 0.5) / (tt + 0.5 * B))
                - math.log((rc[b] + 0.5) / (tr + 0.5 * B))
            )
            for b, c in f.items()
        )
        want[i] = (sum(f.values()), round(lw, 6))

    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    got = {
        r.id: (r.n_feats, r.log_weight)
        for r in text.dsir_log_weights(
            df, "doc_id", "text", F.col("tgt"), buckets=B
        ).collect()
    }
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        assert abs(got[i][1] - want[i][1]) <= 1e-6, i
