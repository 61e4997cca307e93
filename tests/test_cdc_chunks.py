"""Content-defined chunking dedup (operators/dedup.py cdc_chunk_rows /
cdc_dup_chunks): brute-force pure-Python exactness on random corpora,
the boundary re-synchronization property that motivates CDC over fixed
k-token windows, and the cross-document duplicate report. The oracle
SQL replay is checked separately by scripts/oracle_check.py; these pin
the operator semantics independently of DuckDB."""

from __future__ import annotations

import random

from asset_prices_parquet_saver_spark.functions.portable_hash import py_md5_int60
from asset_prices_parquet_saver_spark.operators import dedup

W, DIV = 3, 8


def _ref_chunks(tokens: list[str], w: int = W, divisor: int = DIV):
    """Straight-line reference: cut after token i (1-based) iff the
    md5-60 of the w-token window ending at i is 0 mod divisor, plus
    the document end."""
    out = []
    start = 1
    for i in range(1, len(tokens) + 1):
        cut = i == len(tokens) or (
            i >= w and py_md5_int60(" ".join(tokens[i - w : i])) % divisor == 0
        )
        if cut:
            out.append(
                (start, i, i - start + 1, py_md5_int60(" ".join(tokens[start - 1 : i])))
            )
            start = i + 1
    return out


def _mk_doc(rng: random.Random, n: int) -> list[str]:
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    return [rng.choice(vocab) for _ in range(n)]


def test_cdc_chunks_match_pure_python_reference(spark):
    rng = random.Random(11)
    docs = {i: _mk_doc(rng, rng.randint(1, 120)) for i in range(25)}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        (r["id"], r["chunk_start"], r["chunk_end"], r["chunk_tokens"], r["h"])
        for r in dedup.cdc_chunk_rows(df, "doc_id", "text", w=W, divisor=DIV).collect()
    }
    want = {
        (i, s, e, n, h)
        for i, toks in docs.items()
        for (s, e, n, h) in _ref_chunks(toks)
    }
    assert got == want


def test_cdc_chunks_skip_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "alpha beta")],
        "doc_id long, text string",
    )
    rows = dedup.cdc_chunk_rows(df, "doc_id", "text").collect()
    assert {r["id"] for r in rows} == {3}


def test_cdc_boundaries_resynchronize_after_edit():
    """The CDC property fixed-stride windows lack: inserting one token
    perturbs only cut decisions whose w-window overlaps the edit, so
    every chunk identity after the first re-synced boundary survives.
    Pure-Python on the reference (the Spark kernel is proven identical
    to it above)."""
    rng = random.Random(23)
    toks = _mk_doc(rng, 400)
    edited = toks[:50] + ["INSERTED"] + toks[50:]
    h_old = [h for (_, _, _, h) in _ref_chunks(toks)]
    h_new = [h for (_, _, _, h) in _ref_chunks(edited)]
    m = 0
    while m < min(len(h_old), len(h_new)) and h_old[-1 - m] == h_new[-1 - m]:
        m += 1
    # chunks strictly after the edit's w-window re-sync; with expected
    # chunk length = DIV tokens, ~44 of the ~50 trailing chunks must
    # be bitwise-shared (edit sits at token 50 of 400)
    assert m >= len(h_old) * 3 // 4, (m, len(h_old), len(h_new))
    # and the prefix genuinely changed (the edit is observable)
    assert h_old[: len(h_old) - m] != h_new[: len(h_new) - m]


def test_cdc_dup_chunks_cross_document(spark):
    rng = random.Random(5)
    shared = _mk_doc(rng, 80)
    a = _mk_doc(rng, 40) + shared
    b = shared + _mk_doc(rng, 40)
    c = _mk_doc(rng, 60)
    df = spark.createDataFrame(
        [(1, " ".join(a)), (2, " ".join(b)), (3, " ".join(c))],
        "doc_id long, text string",
    )
    dup = {
        r["h"]: (r["chunk_tokens"], r["n_docs"], r["n_occ"])
        for r in dedup.cdc_dup_chunks(df, "doc_id", "text").collect()
    }
    # interior chunks of the shared 80-token run re-sync in both docs
    ref_a = {h for (_, _, _, h) in _ref_chunks(a)}
    ref_b = {h for (_, _, _, h) in _ref_chunks(b)}
    ref_c = {h for (_, _, _, h) in _ref_chunks(c)}
    expect_shared = ref_a & ref_b
    assert expect_shared, "fixture must produce re-synced shared chunks"
    assert expect_shared <= set(dup), sorted(expect_shared - set(dup))
    for h in expect_shared - ref_c:
        assert dup[h][1] == 2, (h, dup[h])
    # chunks unique to one document never appear in the report
    uniq = (ref_a | ref_b | ref_c) - expect_shared - (ref_a & ref_c) - (ref_b & ref_c)
    assert not (uniq & set(dup))


def _ref_pair_jaccard(docs: dict, max_df: int = 64):
    """Brute-force reference for cdc_near_dup_pairs: distinct chunk
    identity sets per doc, hub-chunk df-band prune, pairwise Jaccard."""
    sets = {i: {h for (_, _, _, h) in _ref_chunks(t)} for i, t in docs.items()}
    from collections import Counter

    df_count = Counter(h for s in sets.values() for h in s)
    kept = {h for h, c in df_count.items() if 2 <= c <= max_df}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            shared = len(sets[a] & sets[b] & kept)
            if shared:
                j = round(shared / (len(sets[a]) + len(sets[b]) - shared), 6)
                out[(a, b)] = (shared, j)
    return out


def test_cdc_near_dup_pairs_match_brute_force(spark):
    rng = random.Random(31)
    base = _mk_doc(rng, 90)
    docs = {
        1: base,
        2: base[:5] + ["EDIT"] + base[5:],          # near-copy, one insert
        3: base[30:70] + _mk_doc(rng, 40),           # partial overlap
        4: _mk_doc(rng, 80),                         # unrelated
        5: list(base),                               # exact copy
    }
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["shared_chunks"], r["jaccard"])
        for r in dedup.cdc_near_dup_pairs(
            df, "doc_id", "text", threshold=0.0, max_df=64
        ).collect()
    }
    want = _ref_pair_jaccard(docs)
    assert got == want
    # the exact copy must be a full-overlap pair; the edited near-copy
    # must score high (re-synced boundaries) — the property the
    # operator exists for
    assert want[(1, 5)][1] == 1.0
    assert want[(1, 2)][1] >= 0.7, want[(1, 2)]


def test_cdc_near_dup_pairs_threshold_and_hub_prune(spark):
    rng = random.Random(47)
    base = _mk_doc(rng, 90)
    docs = {1: base, 2: list(base), 3: base[:40] + _mk_doc(rng, 80)}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
    )
    ref = _ref_pair_jaccard(docs)
    thr = 0.5
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.cdc_near_dup_pairs(
            df, "doc_id", "text", threshold=thr
        ).collect()
    }
    assert got == {p for p, (_, j) in ref.items() if j >= thr}
    # max_df=1 prunes EVERY shared chunk (each appears in >=2 docs):
    # no candidate can survive the hub filter
    assert (
        dedup.cdc_near_dup_pairs(df, "doc_id", "text", threshold=0.0, max_df=1)
        .count()
        == 0
    )


def test_duplicate_aware_weights(spark):
    """Weights are 1/cluster_size under the SAME component relation as
    fuzzy_dedup; singletons weigh 1.0; total weight == #clusters."""
    from asset_prices_parquet_saver_spark.operators.dedup import (
        connected_components,
        duplicate_aware_weights,
        minhash_dedup,
    )
    from asset_prices_parquet_saver_spark.sources.tables import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    out = {
        r["doc_id"]: (r["cluster_size"], r["weight"])
        for r in duplicate_aware_weights(
            docs, "doc_id", "text", threshold=0.3
        ).collect()
    }
    comp = {
        r.id: r.component
        for r in connected_components(
            minhash_dedup(docs, "doc_id", "text", threshold=0.3)
        ).collect()
    }
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert set(out) == all_ids
    from collections import Counter

    sizes = Counter(comp.get(i, i) for i in all_ids)
    n_clusters = len(sizes)
    for i in all_ids:
        size, w = out[i]
        assert size == sizes[comp.get(i, i)]
        assert w == round(1.0 / size, 6)
    assert any(s > 1 for s in sizes.values()), "fixture should have dups"
    total = sum(w for (_, w) in out.values())
    assert abs(total - n_clusters) < 1e-3
