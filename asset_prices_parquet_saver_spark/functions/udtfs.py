"""Python UDTFs (user-defined TABLE functions) — the §2.10 surface
member the grouped-map / grouped-agg / mapInPandas / stateful variants
don't cover: a per-row function that RETURNS A RELATION, consumed via
``LATERAL`` correlation in SQL.

UDTFs are the slow path (row-at-a-time Python, like classic UDFs) —
every operator here also exists as a vectorized DataFrame composition
(operators/text.py); the UDTF variant exists to keep the API surface
complete and hash-checked. For bulk work prefer the built-in
explode/groupBy pipelines.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

# Java/DuckDB \s (no UNICODE flag) = ASCII [ \t\n\x0B\f\r] ONLY.
# Python str.split() splits on ALL Unicode whitespace (NBSP, ideographic
# space, ...), which would diverge from the engine's text_ops.words
# tokenizer and the oracle's string_split_regex on any non-ASCII-spaced
# corpus — so tokenize with the exact ASCII class instead.
_ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")


@udtf(returnType="doc_id bigint, term string, tf bigint")
class TermCounts:
    """Explode one document into its (term, term-frequency) rows.

    ASCII-whitespace split (empties dropped) matches the engine's
    ``text_ops.words`` tokenizer (Java regex ``\\s+``) and the oracle's
    ``string_split_regex(trim(text), '\\s+')`` + empty filter — token
    for token, including on Unicode-whitespace corpora.
    """

    def eval(self, doc_id: int, text: str):  # noqa: D102 (UDTF contract)
        if text is None:
            return
        counts: dict[str, int] = {}
        for t in _ASCII_WS.split(text):
            if not t:
                continue
            counts[t] = counts.get(t, 0) + 1
        for term, tf in counts.items():
            yield doc_id, term, tf


def term_counts_lateral(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Per-document term frequencies via LATERAL UDTF correlation."""
    spark.udtf.register("term_counts", TermCounts)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT tc.doc_id, tc.term, tc.tf "
        "FROM _udtf_docs, LATERAL term_counts(doc_id, text) tc"
    )
