"""JSONL corpus source: schema-contracted reads, corrupt-line audit,
round-trip through the writer."""

from __future__ import annotations

from asset_prices_parquet_saver_spark.sources import jsonl

SCHEMA = "doc_id long, text string, lang string"


def _write_lines(p, lines):
    p.write_text("\n".join(lines) + "\n")


def test_read_jsonl_splits_good_and_corrupt(spark, tmp_path):
    src = tmp_path / "corpus.jsonl"
    _write_lines(
        src,
        [
            '{"doc_id": 1, "text": "hello world", "lang": "en"}',
            'this line is not json at all',
            '{"doc_id": 2, "text": "hola mundo", "lang": "es"}',
            '{"doc_id": 3, "text": "broken',  # truncated object
        ],
    )
    good, bad = jsonl.read_jsonl(spark, str(src), SCHEMA)
    rows = {r.doc_id: (r.text, r.lang) for r in good.collect()}
    assert rows == {1: ("hello world", "en"), 2: ("hola mundo", "es")}
    bad_lines = sorted(r.raw_line for r in bad.collect())
    assert bad_lines == ["this line is not json at all", '{"doc_id": 3, "text": "broken']
    rep = jsonl.ingest_report(good, bad)
    assert rep == {"rows": 2, "corrupt_lines": 2, "corrupt_rate": 0.5}


def test_read_jsonl_missing_fields_are_null_not_corrupt(spark, tmp_path):
    # schema contract: absent keys are NULL columns (valid JSON is
    # never routed to the audit channel just for sparseness)
    src = tmp_path / "sparse.jsonl"
    _write_lines(src, ['{"doc_id": 9}', '{"text": "only text"}'])
    good, bad = jsonl.read_jsonl(spark, str(src), SCHEMA)
    assert bad.count() == 0
    got = {(r.doc_id, r.text) for r in good.collect()}
    assert got == {(9, None), (None, "only text")}


def test_jsonl_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "d e f", "de")], SCHEMA
    )
    out = str(tmp_path / "out_jsonl")
    jsonl.write_jsonl(df, out)
    good, bad = jsonl.read_jsonl(spark, out, SCHEMA)
    assert bad.count() == 0
    assert sorted(map(tuple, good.collect())) == sorted(map(tuple, df.collect()))


# ------------------------------ CSV sibling (same audit pattern)

def test_read_csv_splits_good_and_corrupt(spark, tmp_path):
    from asset_prices_parquet_saver_spark.sources import csvsrc

    src = tmp_path / "table.csv"
    src.write_text(
        "doc_id,text,lang\n"
        '1,"hello world",en\n'
        "2,not quoted but fine,es\n"
        "3,too,many,columns,here\n"   # arity mismatch -> corrupt
        "not_a_number,oops,de\n"      # type mismatch -> corrupt
    )
    good, bad = csvsrc.read_csv(
        spark, str(src), "doc_id long, text string, lang string"
    )
    rows = {r.doc_id: (r.text, r.lang) for r in good.collect()}
    assert rows == {1: ("hello world", "en"), 2: ("not quoted but fine", "es")}
    assert bad.count() == 2
    raws = {r.raw_line for r in bad.collect()}
    assert any("too,many" in x for x in raws)
    assert any("not_a_number" in x for x in raws)
