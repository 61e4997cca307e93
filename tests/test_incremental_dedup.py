"""Incremental fuzzy dedup against a manifest-committed signature
index: batch-over-batch behavior must equal the match-any-predecessor
reference, and the index must grow by append-log commits."""

import os

from pyspark.sql import Row

from asset_prices_parquet_saver_spark.operators import incremental_dedup as inc
from asset_prices_parquet_saver_spark.sources import manifest

DOCS = [
    # batch 1
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "an entirely different document about spark engines"),
    (3, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
    # batch 2
    (10, "the quick brown fox jumps over the lazy dog"),  # dup of indexed 1
    (11, "fresh content that matches nothing else here at all"),
    (12, "fresh content that matches nothing else here at ALL"),  # near-dup of 11
    # batch 3
    (20, "an entirely different document about spark engines"),  # dup of 2
    (21, "completely novel text with its own unique shingles only"),
]


def _reference_greedy(batches, threshold=0.5):
    """match-any-predecessor over the concatenated arrival order."""
    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + 2]) for i in range(len(w) - 1)}

    seen: list[tuple[int, set]] = []
    survivors = []
    for batch in batches:
        for did, txt in batch:
            s = sh(txt)
            dup = any(
                len(s & ps) / len(s | ps) >= threshold for _, ps in seen if s or ps
            )
            # NOTE: reference intentionally checks ALL predecessors
            # (dropped ones included), matching dedup_increment
            seen.append((did, s))
            if not dup:
                survivors.append(did)
    return survivors


def test_incremental_matches_reference_and_appends(spark, tmp_path):
    idx = str(tmp_path / "sigindex")
    batches = [DOCS[:3], DOCS[3:6], DOCS[6:]]
    got = []
    for batch in batches:
        df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in batch])
        # LSH banding can only MISS pairs vs brute force; with these
        # near-exact dups (jaccard ~0.8+) all bands collide reliably
        out = inc.run_incremental_dedup(spark, df, idx, threshold=0.5)
        got.extend(r["doc_id"] for r in out.collect())
    assert sorted(got) == sorted(_reference_greedy(batches))
    # index = one signature row per SURVIVOR, grown by append segments
    rows = manifest.read_versioned(spark, idx, schema=inc.INDEX_SCHEMA).collect()
    assert sorted(r["id"] for r in rows) == sorted(got)
    m_segments = manifest._read_manifest(idx)["segments"]
    assert len(m_segments) == 3  # one appended segment per batch
    # compaction folds the log back to one segment, same content
    manifest.compact_versioned(spark, idx, num_files=1, schema=inc.INDEX_SCHEMA)
    assert len(manifest._read_manifest(idx)["segments"]) == 1
    rows2 = manifest.read_versioned(spark, idx, schema=inc.INDEX_SCHEMA).collect()
    assert sorted(r["id"] for r in rows2) == sorted(got)


def test_append_requires_absorbed_legacy(spark, tmp_path):
    import pytest

    t = str(tmp_path / "tbl")
    spark.createDataFrame([(1,)], "x long").write.parquet(t)
    df = spark.createDataFrame([(2,)], "x long")
    with pytest.raises(ValueError, match="legacy"):
        manifest.commit_append(df, t)
    manifest.commit_versioned(
        manifest.read_versioned(spark, t, "x long").unionByName(df), t
    )
    manifest.commit_append(spark.createDataFrame([(3,)], "x long"), t)
    got = sorted(r["x"] for r in manifest.read_versioned(spark, t).collect())
    assert got == [1, 2, 3]


def test_streaming_dedup_end_to_end(spark, tmp_path):
    idx = str(tmp_path / "sigindex")
    corpus = str(tmp_path / "corpus")
    drop = tmp_path / "drop"
    drop.mkdir()
    # three files -> micro-batches (order of batches may vary within a
    # single availableNow run; write sequentially to three dirs instead)
    spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in DOCS], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(drop / "all"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(drop / "all")
    )
    q = inc.run_streaming_dedup(
        spark,
        stream,
        idx,
        corpus,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    got = sorted(
        r["doc_id"]
        for r in manifest.read_versioned(
            spark, corpus, schema="doc_id long, text string"
        ).collect()
    )
    assert got == sorted(_reference_greedy([DOCS]))
