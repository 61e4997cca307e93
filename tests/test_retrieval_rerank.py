"""MMR diversification and bigram-LM scoring: independent pure-Python
references on synthetic fixtures (the oracle SQL is checked separately
by scripts/oracle_check.py; these pin the semantics)."""

from __future__ import annotations

import math

import numpy as np

from asset_prices_parquet_saver_spark.operators import similarity as sim
from asset_prices_parquet_saver_spark.operators import text as text_ops


def _mmr_reference(ids, rels, vecs, k, lam):
    """Straight-line greedy MMR with the same round-before-argmax rule."""
    def cos(a, b):
        return round(float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    remaining = list(ids)
    selected = []
    out = []
    for rank in range(1, k + 1):
        best = None
        for i in remaining:
            pen = max((cos(vecs[i], vecs[s]) for s in selected), default=0.0)
            score = round(lam * rels[i] - (1.0 - lam) * pen, 6)
            key = (-score, i)
            if best is None or key < best[0]:
                best = (key, i, score)
        _, pick, score = best
        out.append((pick, rank, rels[pick], score))
        selected.append(pick)
        remaining.remove(pick)
    return out


def test_mmr_matches_greedy_reference(spark):
    rng = np.random.default_rng(7)
    n, dim = 12, 8
    vecs = {i: rng.normal(size=dim) for i in range(n)}
    q = rng.normal(size=dim)
    rels = {
        i: round(float(np.dot(vecs[i], q) / (np.linalg.norm(vecs[i]) * np.linalg.norm(q))), 6)
        for i in range(n)
    }
    cand = spark.createDataFrame(
        [(i, rels[i], [float(x) for x in vecs[i]]) for i in range(n)],
        "id long, rel double, v array<double>",
    )
    got = [
        (r["id"], r["mmr_rank"], r["relevance"], r["mmr_score"])
        for r in sim.mmr_rerank(cand, k=5, lam=0.7)
        .orderBy("mmr_rank")
        .collect()
    ]
    want = _mmr_reference(list(range(n)), rels, vecs, k=5, lam=0.7)
    # selection order must match exactly; scores may differ in the 6th
    # decimal (Python round() is half-even, Spark/DuckDB are half-up)
    assert [(g[0], g[1], g[2]) for g in got] == [(w[0], w[1], w[2]) for w in want]
    for g, w in zip(got, want):
        assert abs(g[3] - w[3]) <= 1.01e-6, (g, w)


def test_mmr_prefers_diverse_over_redundant(spark):
    # two near-identical high-rel docs + one orthogonal lower-rel doc:
    # rank 2 must be the diverse one, not the near-duplicate.
    cand = spark.createDataFrame(
        [
            (1, 0.95, [1.0, 0.0]),
            (2, 0.94, [0.999, 0.001]),
            (3, 0.60, [0.0, 1.0]),
        ],
        "id long, rel double, v array<double>",
    )
    got = [r["id"] for r in sim.mmr_rerank(cand, k=3, lam=0.7).orderBy("mmr_rank").collect()]
    assert got == [1, 3, 2]


def test_bigram_logppl_hand_computed(spark):
    # corpus: d1 = "a b a b", d2 = "a b"
    # unigrams: a:3 b:3 → V=2
    # bigrams: d1: (a,b),(b,a),(a,b); d2: (a,b) → c(a,b)=3, c(b,a)=1
    df = spark.createDataFrame([(1, "a b a b"), (2, "a b")], "doc_id long, text string")
    out = {r["id"]: r for r in text_ops.bigram_logppl(df, "doc_id", "text").collect()}
    p_ab = (3 + 1) / (3 + 2)   # c12+1 / c1(a)+V
    p_ba = (1 + 1) / (3 + 2)
    want_d1 = round(-(2 * math.log(p_ab) + math.log(p_ba)) / 3, 6)
    want_d2 = round(-math.log(p_ab), 6)
    assert out[1]["n_bigrams"] == 3 and out[1]["avg_neg_logp"] == want_d1
    assert out[2]["n_bigrams"] == 1 and out[2]["avg_neg_logp"] == want_d2


def test_bigram_logppl_drops_single_word_docs(spark):
    df = spark.createDataFrame([(1, "only"), (2, "two words")], "doc_id long, text string")
    got = {r["id"] for r in text_ops.bigram_logppl(df, "doc_id", "text").collect()}
    assert got == {2}


def _mrr(spark, docs, queries, k=10):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["query_id"]: (r["first_rank"], r[f"rr{k}"], r[f"hits{k}"])
        for r in text_ops.retrieval_mrr(df, "doc_id", "text", queries, k=k).collect()
    }


def test_retrieval_mrr_strict_label_and_failed_query(spark):
    # d1 holds BOTH q1 terms (tf 2/1), d2 and d3 one each → only d1 is
    # relevant under the strict all-terms label and BM25 ranks it
    # first (more matching terms, higher tf, same length ballpark).
    docs = [
        (1, "apple banana apple"),
        (2, "apple cherry fig"),
        (3, "banana kiwi lime"),
    ]
    out = _mrr(
        spark,
        docs,
        {"q1": ("apple", "banana"), "q2": ("durian",), "q3": ("apple",)},
    )
    assert out["q1"] == (1, 1.0, 1)
    # no document contains durian: the row still exists, rr = 0
    assert out["q2"] == (None, 0.0, 0)
    # q3: d1 and d2 both contain apple → 2 hits, best at rank 1
    assert out["q3"][0] == 1 and out["q3"][2] == 2


def test_retrieval_mrr_k_cutoff(spark):
    # 3 docs all relevant to q; k=1 keeps only the top-ranked hit
    docs = [(i, "apple pad" + " pad" * i) for i in range(1, 4)]
    out = _mrr(spark, docs, {"q": ("apple",)}, k=1)
    assert out["q"] == (1, 1.0, 1)


def test_retrieval_mrr_reciprocal_rank_of_later_hit(spark):
    # d1 and d3 each match only ONE of q's two terms but are 1-2 token
    # docs, so BM25's length normalization ranks both above the long
    # d2 (the only doc matching BOTH terms) — first_rank must be d2's
    # rank 3, rr = 1/3, because d1/d3 fail the strict all-terms label.
    docs = [
        (1, "banana"),
        (2, "apple banana " + " ".join(f"pad{i}" for i in range(18))),
        (3, "apple kiwi"),
    ]
    out = _mrr(spark, docs, {"q": ("apple", "banana")})
    assert out["q"] == (3, 0.333333, 1)
