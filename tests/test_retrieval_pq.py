"""Unit tests: BM25 retrieval, chunk-level corpus dedup, and PQ ANN."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.operators import similarity as sim
from asset_prices_parquet_saver_spark.operators import text as text_ops
from asset_prices_parquet_saver_spark.sources.tables import read_table


# ----------------------------------------------------------------- BM25

def test_bm25_matches_formula(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="spark spark merge row"),
            Row(doc_id=1, text="spark table table table"),
            Row(doc_id=2, text="row table key value"),
        ]
    )
    out = {
        r.id: (r.score, r.n_terms_hit)
        for r in text_ops.bm25_topk(
            docs, "doc_id", "text", ("spark", "merge"), k=10
        ).collect()
    }
    # reference: N=3, avgdl=4; spark df=2, merge df=1
    k1, b = 1.2, 0.75

    def bm25(tf, df, dl, n=3, avgdl=4.0):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp0 = round(bm25(2, 2, 4) + bm25(1, 1, 4), 6)
    exp1 = round(bm25(1, 2, 4), 6)
    assert out[0] == (exp0, 2)
    assert out[1] == (exp1, 1)
    assert 2 not in out  # no query terms -> not retrieved


def test_bm25_topk_cut_is_deterministic(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    a = text_ops.bm25_topk(d, "doc_id", "text", ("table", "row"), k=5).collect()
    b = text_ops.bm25_topk(d, "doc_id", "text", ("table", "row"), k=5).collect()
    assert [r.id for r in a] == [r.id for r in b]
    assert len(a) == 5
    scores = [r.score for r in a]
    assert scores == sorted(scores, reverse=True)


# ----------------------------------------------------- chunk-level dedup

def test_chunk_dedup_keeps_first_occurrence(spark):
    # 4-token chunks; doc 0 owns chunk A; doc 1 repeats A twice around B
    A = "a b c d"
    B = "e f g h"
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=A),
            Row(doc_id=1, text=f"{A} {B} {A}"),
        ]
    )
    out = {
        r.id: r
        for r in text_ops.chunk_dedup(
            docs, "doc_id", "text", tokens_per_chunk=4
        ).collect()
    }
    assert (out[0].n_chunks, out[0].n_kept, out[0].cleaned_text) == (1, 1, A)
    # doc 1: its first A-chunk loses to doc 0's, its second to the first
    assert (out[1].n_chunks, out[1].n_kept, out[1].cleaned_text) == (3, 1, B)


def test_chunk_dedup_tail_chunk_and_empty_survivors(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="x y z"),  # single short chunk
            Row(doc_id=1, text="x y z"),  # exact repeat -> everything scrubbed
        ]
    )
    out = {
        r.id: r
        for r in text_ops.chunk_dedup(
            docs, "doc_id", "text", tokens_per_chunk=4
        ).collect()
    }
    assert (out[0].n_kept, out[0].cleaned_text) == (1, "x y z")
    assert (out[1].n_kept, out[1].cleaned_text) == (0, "")


# ------------------------------------------------------------------- PQ

def test_pq_codebook_training_shape_and_determinism(spark, sf_dir):
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    b1 = sim.train_pq_codebooks(e, 4, 8)
    b2 = sim.train_pq_codebooks(e, 4, 8)
    assert b1.shape == (4, 8, 16)
    assert np.array_equal(b1, b2)


def test_ann_pq_recall_against_exact_l2(spark, sf_dir):
    e = read_table(spark, sf_dir, "embeddings")
    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([list(r.embedding) for r in rows], dtype="float64")
    order = np.argsort(ids)
    ids, V = ids[order], V[order]

    q = e.filter(F.col("vec_id") < 5)
    books = sim.train_pq_codebooks(
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("v")),
        16,
        32,
    )
    # k = corpus size -> the full ADC distance relation, so the test can
    # check PQ's actual guarantee (distance approximation), not just the
    # noisy small-sample recall@5.
    full = sim.ann_pq_topk(e, q, books, k=len(ids)).collect()
    by_q: dict[int, dict[int, float]] = {}
    for r in full:
        by_q.setdefault(r.query_id, {})[r.vec_id] = r.adc_dist

    hits = total = 0
    for qid in range(5):
        qv = V[ids == qid][0]
        d = ((V - qv) ** 2).sum(axis=1)
        other = ids != qid
        adc = np.array([by_q[qid][i] for i in ids[other]])
        # ADC must track true squared-L2 distance strongly
        assert np.corrcoef(adc, d[other])[0, 1] >= 0.6
        exact = set(ids[other][np.argsort(d[other], kind="stable")[:5]].tolist())
        approx5 = set(
            ids[other][np.argsort(adc, kind="stable")[:5]].tolist()
        )
        hits += len(exact & approx5)
        total += 5
    assert hits / total >= 0.3  # far above the 5/499 random baseline


def test_ann_ivfpq_is_cell_restricted_pq(spark, sf_dir):
    """IVF-PQ must score candidates with the SAME ADC distance the
    full-scan PQ operator assigns — the cell pruning changes which
    pairs are scored, never their distances — and every returned pair's
    corpus vector must share a probed cell with the query."""
    import numpy as np

    from asset_prices_parquet_saver_spark.operators.ivf_centroids import (
        PINNED_IVF_CENTROIDS,
    )
    from asset_prices_parquet_saver_spark.operators.pq_codebooks import (
        PINNED_PQ_CODEBOOKS,
    )

    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4)
    full = {
        (r.query_id, r.vec_id): r.adc_dist
        for r in sim.ann_pq_topk(e, q, PINNED_PQ_CODEBOOKS, k=10**9).collect()
    }
    ivfpq = sim.ann_ivfpq_topk(
        e, q, PINNED_IVF_CENTROIDS, PINNED_PQ_CODEBOOKS, k=5, nprobe=3
    ).collect()
    assert len(ivfpq) > 0
    for r in ivfpq:
        assert full[(r.query_id, r.vec_id)] == r.adc_dist

    # replay cell membership in numpy
    C = np.asarray(PINNED_IVF_CENTROIDS)
    rows = {r.vec_id: np.array(list(r.embedding), dtype="float64") for r in e.collect()}

    def cells(v, top):
        vn = v / np.linalg.norm(v)
        return np.argsort(-(C @ vn), kind="stable")[:top]

    for r in ivfpq:
        probed = set(cells(rows[r.query_id], 3).tolist())
        assert cells(rows[r.vec_id], 1)[0] in probed


# ------------------------------------------------- chunking properties

def test_chunking_partitions_tokens_exactly(spark):
    """Property (hypothesis-style over a deterministic grid): chunking
    partitions the token stream — ceil(n/k) chunks, every chunk full
    except possibly the last, and in-order concatenation reproduces the
    normalized document."""
    import math

    from asset_prices_parquet_saver_spark.operators.text import chunk_documents

    texts = [
        " ".join(f"w{i}" for i in range(n)) for n in (1, 7, 8, 9, 15, 16, 17, 33)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_documents(docs, "doc_id", "text", tokens_per_chunk=8).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        n = len(t.split())
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_id)
        assert len(chunks) == math.ceil(n / 8)
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        assert all(c.n_tokens == 8 for c in chunks[:-1])
        assert " ".join(c.chunk_text for c in chunks) == t


def test_chunk_dedup_conserves_chunks(spark, sf_dir):
    """Corpus-wide invariants on real data: Σ n_chunks equals the
    chunk-table row count, Σ n_kept equals the number of distinct chunk
    texts, and no document gains chunks."""
    from asset_prices_parquet_saver_spark.operators.text import (
        chunk_dedup,
        chunk_documents,
    )

    d = read_table(spark, sf_dir, "documents")
    out = chunk_dedup(d, "doc_id", "text", tokens_per_chunk=16).collect()
    chunks = chunk_documents(d, "doc_id", "text", tokens_per_chunk=16)
    assert sum(r.n_chunks for r in out) == chunks.count()
    assert (
        sum(r.n_kept for r in out)
        == chunks.select("chunk_text").distinct().count()
    )
    assert all(0 <= r.n_kept <= r.n_chunks for r in out)


# --------------------------------------------- int8 scalar quantization

def test_int8_quantization_bounds_and_error(spark, sf_dir):
    """Codes stay in [0, 255]; per-vector MSE is bounded by the worst
    per-dimension half-step squared (the scalar-quantization
    guarantee); extreme rows round-trip exactly at the range ends."""
    e = read_table(spark, sf_dir, "embeddings")
    out = sim.quantize_embeddings_int8(e).collect()
    assert len(out) == e.count()

    rows = e.collect()
    V = np.array([list(r.embedding) for r in rows], dtype="float64")
    step = (V.max(axis=0) - V.min(axis=0)) / 255.0
    worst = float(((step / 2) ** 2).max())
    for r in out:
        assert len(r.codes) == V.shape[1]
        assert all(0 <= c <= 255 for c in r.codes)
        assert 0 <= r.mse <= worst + 1e-9


def test_ivfadc_residual_codes_reconstruct_better_on_clustered_data(spark):
    """The reason IVFADC exists: quantizing residuals x − c_cell spends
    the code budget on the within-cell distribution. That only pays
    when cells actually capture structure — so the test uses CLUSTERED
    synthetic data (tight blobs around unit directions, the shape of
    real embedding corpora; the driver's isotropic random embeddings
    genuinely do not reward residuals, which is why the query keeps
    both variants). Whole pipeline replayed through the public
    training/encoding helpers."""
    from pyspark.sql import Row

    rng = np.random.default_rng(7)
    dim, n_clusters, per = 16, 8, 60
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = np.repeat(centers, per, axis=0) + 0.05 * rng.standard_normal(
        (n_clusters * per, dim)
    )
    emb = spark.createDataFrame(
        [Row(vec_id=i, v=[float(x) for x in X[i]]) for i in range(len(X))]
    )
    C = sim._train_centroids(emb, n_clusters)
    Vn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cells = np.argsort(-(Vn @ C.T), axis=1, kind="stable")[:, 0]

    res_rows = [
        Row(vec_id=i, v=[float(x) for x in (X[i] - C[cells[i]])])
        for i in range(len(X))
    ]
    res_emb = spark.createDataFrame(res_rows)
    raw_books = sim.train_pq_codebooks(emb, 4, 8)
    res_books = sim.train_pq_codebooks(res_emb, 4, 8)

    def recon_err(Y, books):
        m, ksub, dsub = books.shape
        err = 0.0
        for j in range(m):
            S = Y[:, j * dsub : (j + 1) * dsub]
            B = books[j]
            d = (
                (S**2).sum(axis=1, keepdims=True) - 2 * (S @ B.T) + (B**2).sum(axis=1)
            )
            err += ((S - B[d.argmin(axis=1)]) ** 2).sum()
        return err / len(Y)

    raw_err = recon_err(X, raw_books)
    res_err = recon_err(X - C[cells], res_books)
    assert res_err < raw_err


def test_ann_ivfadc_runs_and_ranks(spark, sf_dir):
    from asset_prices_parquet_saver_spark.operators.ivf_centroids import (
        PINNED_IVF_CENTROIDS,
    )
    from asset_prices_parquet_saver_spark.operators.pq_res_codebooks import (
        PINNED_RES_CODEBOOKS,
    )

    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4)
    out = sim.ann_ivfadc_topk(
        e, q, PINNED_IVF_CENTROIDS, PINNED_RES_CODEBOOKS, k=5, nprobe=3
    ).collect()
    assert len(out) > 0
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        dists = [r.adc_dist for r in rows]
        assert dists == sorted(dists)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))


def test_persisted_pq_index_reproduces_from_scratch_results(spark, sf_dir, tmp_path):
    """build once / query many: the persisted code index must yield
    exactly the from-scratch ann_pq_topk result set."""
    from asset_prices_parquet_saver_spark.operators.pq_codebooks import (
        PINNED_PQ_CODEBOOKS,
    )

    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4)
    table = str(tmp_path / "pq_index")
    sim.build_pq_index(e, PINNED_PQ_CODEBOOKS, table)
    fresh = {
        (r.query_id, r.vec_id, r.adc_dist, r.rank)
        for r in sim.ann_pq_topk(e, q, PINNED_PQ_CODEBOOKS, k=5).collect()
    }
    indexed = {
        (r.query_id, r.vec_id, r.adc_dist, r.rank)
        for r in sim.ann_pq_topk_from_index(
            spark, table, q, PINNED_PQ_CODEBOOKS, k=5
        ).collect()
    }
    assert indexed == fresh


def test_strided_chunking_overlap_properties(spark):
    """Sliding windows: one chunk per stride-start < n, full k-token
    windows except the tail, and consecutive chunks overlap by k − s
    tokens so every boundary-spanning passage appears whole somewhere."""
    from asset_prices_parquet_saver_spark.operators.text import chunk_documents

    n, k, s = 20, 8, 4
    text = " ".join(f"w{i}" for i in range(n))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(docs, "doc_id", "text", k, stride=s).collect(),
        key=lambda r: r.chunk_id,
    )
    assert len(rows) == -(-n // s)  # one window per start position
    toks = text.split()
    for r in rows:
        start = r.chunk_id * s
        expect = toks[start : start + k]
        assert r.chunk_text.split() == expect
        assert r.n_tokens == len(expect)
    # consecutive windows share k - s tokens
    assert rows[0].chunk_text.split()[s:] == rows[1].chunk_text.split()[: k - s]


def test_chunking_rejects_bad_stride(spark):
    import pytest

    from asset_prices_parquet_saver_spark.operators.text import chunk_documents

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", 8, stride=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", 8, stride=9)


def test_append_pq_index_equals_full_rebuild(spark, sf_dir, tmp_path):
    """Incremental ingestion: index built on half the corpus + an
    appended second half must answer queries identically to an index
    built on everything at once — and a replayed epoch is a no-op."""
    from asset_prices_parquet_saver_spark.operators.pq_codebooks import (
        PINNED_PQ_CODEBOOKS,
    )
    from asset_prices_parquet_saver_spark.sources import manifest

    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4)
    half_a = e.filter(F.col("vec_id") % 2 == 0)
    half_b = e.filter(F.col("vec_id") % 2 == 1)

    full = str(tmp_path / "full")
    incr = str(tmp_path / "incr")
    sim.build_pq_index(e, PINNED_PQ_CODEBOOKS, full)
    sim.append_pq_index(half_a, PINNED_PQ_CODEBOOKS, incr, epoch=0)
    sim.append_pq_index(half_b, PINNED_PQ_CODEBOOKS, incr, epoch=1)
    # crash replay of epoch 1 must not duplicate codes
    sim.append_pq_index(half_b, PINNED_PQ_CODEBOOKS, incr, epoch=1)

    want = {
        (r.query_id, r.vec_id, r.adc_dist, r.rank)
        for r in sim.ann_pq_topk_from_index(
            spark, full, q, PINNED_PQ_CODEBOOKS, k=5
        ).collect()
    }
    got = {
        (r.query_id, r.vec_id, r.adc_dist, r.rank)
        for r in sim.ann_pq_topk_from_index(
            spark, incr, q, PINNED_PQ_CODEBOOKS, k=5
        ).collect()
    }
    assert got == want
    # and compaction folds segments without changing answers
    manifest.compact_versioned(spark, incr)
    after = {
        (r.query_id, r.vec_id, r.adc_dist, r.rank)
        for r in sim.ann_pq_topk_from_index(
            spark, incr, q, PINNED_PQ_CODEBOOKS, k=5
        ).collect()
    }
    assert after == want


def test_persisted_ivf_index_reproduces_from_scratch_results(spark, sf_dir, tmp_path):
    """IVF build-once/query-many: persisted posting lists must answer
    exactly like the from-scratch operator under the same pinned
    quantizer, through incremental appends, crash replay, and
    compaction."""
    from asset_prices_parquet_saver_spark.operators.ivf_centroids import (
        PINNED_IVF_CENTROIDS,
    )
    from asset_prices_parquet_saver_spark.sources import manifest

    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4)
    want = {
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in sim.ann_ivf_topk(
            e, q, k=5, nprobe=2, centroids=PINNED_IVF_CENTROIDS
        ).collect()
    }

    full = str(tmp_path / "ivf_full")
    sim.build_ivf_index(e, PINNED_IVF_CENTROIDS, full)
    got = {
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in sim.ann_ivf_topk_from_index(
            spark, full, q, PINNED_IVF_CENTROIDS, k=5, nprobe=2
        ).collect()
    }
    assert got == want

    incr = str(tmp_path / "ivf_incr")
    sim.append_ivf_index(e.filter(F.col("vec_id") % 2 == 0), PINNED_IVF_CENTROIDS, incr, epoch=0)
    sim.append_ivf_index(e.filter(F.col("vec_id") % 2 == 1), PINNED_IVF_CENTROIDS, incr, epoch=1)
    sim.append_ivf_index(e.filter(F.col("vec_id") % 2 == 1), PINNED_IVF_CENTROIDS, incr, epoch=1)  # replay
    manifest.compact_versioned(spark, incr)
    got2 = {
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in sim.ann_ivf_topk_from_index(
            spark, incr, q, PINNED_IVF_CENTROIDS, k=5, nprobe=2
        ).collect()
    }
    assert got2 == want


# --------------------------------- ANN recall@k evaluation

def test_ann_recall_counts_intersection_per_query(spark):
    from asset_prices_parquet_saver_spark.operators import similarity as sim

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], ["query_id", "vec_id"]
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 20), (2, 21)], ["query_id", "vec_id"]
    )
    out = {
        r.query_id: (r.n_hits, r.recall)
        for r in sim.ann_recall(exact, approx, k=2).collect()
    }
    assert out == {1: (1, 0.5), 2: (2, 1.0)}


def test_ann_recall_keeps_zero_hit_queries(spark):
    from asset_prices_parquet_saver_spark.operators import similarity as sim

    exact = spark.createDataFrame([(7, 70), (7, 71)], ["query_id", "vec_id"])
    approx = spark.createDataFrame([(7, 80), (7, 81)], ["query_id", "vec_id"])
    out = sim.ann_recall(exact, approx, k=2).collect()
    assert [(r.query_id, r.n_hits, r.recall) for r in out] == [(7, 0, 0.0)]


def test_delete_from_index_tombstones_then_purge(spark, sf_dir, tmp_path):
    """Right-to-be-forgotten: tombstoned vectors must vanish from
    query results immediately (logical delete), equal the rebuilt-
    without-them index exactly, and purge_tombstones must physically
    remove them and reset the tombstone set — all without touching
    the surviving rows' segments until the purge."""
    from pyspark.sql import Row

    from asset_prices_parquet_saver_spark.operators.pq_codebooks import (
        PINNED_PQ_CODEBOOKS,
    )
    from asset_prices_parquet_saver_spark.sources import manifest

    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 2)
    table = str(tmp_path / "pq_del")
    sim.build_pq_index(e, PINNED_PQ_CODEBOOKS, table)

    gone = [5, 7, 11]
    sim.delete_from_index(
        spark,
        spark.createDataFrame([Row(vec_id=i) for i in gone], "vec_id long"),
        table,
        epoch=0,
    )
    # replayed delete epoch is a no-op append (same txn key)
    sim.delete_from_index(
        spark,
        spark.createDataFrame([Row(vec_id=i) for i in gone], "vec_id long"),
        table,
        epoch=0,
    )
    got = sim.ann_pq_topk_from_index(
        spark, table, q, PINNED_PQ_CODEBOOKS, k=5
    )
    assert not {r.vec_id for r in got.collect()} & set(gone)
    # logical delete == physical rebuild without the ids
    rebuilt = str(tmp_path / "pq_rebuilt")
    sim.build_pq_index(
        e.filter(~F.col("vec_id").isin(gone)), PINNED_PQ_CODEBOOKS, rebuilt
    )
    want = {
        (r.query_id, r.vec_id, r.adc_dist, r.rank)
        for r in sim.ann_pq_topk_from_index(
            spark, rebuilt, q, PINNED_PQ_CODEBOOKS, k=5
        ).collect()
    }
    assert {
        (r.query_id, r.vec_id, r.adc_dist, r.rank)
        for r in got.collect()
    } == want

    removed = sim.purge_tombstones(spark, table)
    assert removed == 3 * len(PINNED_PQ_CODEBOOKS)  # one row per subspace
    # tombstone set reset; answers unchanged after the physical purge
    tomb = manifest.read_versioned(
        spark, sim._tombstone_table(table), schema="vec_id long"
    )
    assert tomb.count() == 0
    after = {
        (r.query_id, r.vec_id, r.adc_dist, r.rank)
        for r in sim.ann_pq_topk_from_index(
            spark, table, q, PINNED_PQ_CODEBOOKS, k=5
        ).collect()
    }
    assert after == want


def test_delete_from_ivf_index(spark, sf_dir, tmp_path):
    from pyspark.sql import Row

    from asset_prices_parquet_saver_spark.operators.ivf_centroids import (
        PINNED_IVF_CENTROIDS,
    )

    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 2)
    table = str(tmp_path / "ivf_del")
    sim.build_ivf_index(e, PINNED_IVF_CENTROIDS, table)
    sim.delete_from_index(
        spark,
        spark.createDataFrame([Row(vec_id=3)], "vec_id long"),
        table,
    )
    got = sim.ann_ivf_topk_from_index(
        spark, table, q, PINNED_IVF_CENTROIDS, k=5
    )
    assert 3 not in {r.vec_id for r in got.collect()}
    want = {
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in sim.ann_ivf_topk_from_index(
            spark,
            table,
            q,
            PINNED_IVF_CENTROIDS,
            k=5,
        ).collect()
    }
    removed = sim.purge_tombstones(spark, table, stats_cols=["cell"])
    assert removed == 1
    after = {
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in sim.ann_ivf_topk_from_index(
            spark, table, q, PINNED_IVF_CENTROIDS, k=5
        ).collect()
    }
    assert after == want
