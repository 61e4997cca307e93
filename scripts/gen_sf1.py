#!/usr/bin/env python
"""Generate an sf1 scale-up of the driver's sf0.1 testdata for the
SECOND scaling decade of bench.py (sf0.01 → sf0.1 → sf1).

The driver ships sf{0.001,0.01,0.1} only; the 100×-scale argument rests
on measured exponents, and one decade at toy sizes is weak evidence. We
cannot (and must not) re-run the driver's generator, so sf1 is a
replication scale-up of sf0.1 — 10 deterministic replicas with disjoint
key ranges — built so each table keeps the DISTRIBUTIONAL properties
the queries' costs depend on:

- every key column is shifted by ``replica × (max_key + 1)`` so key
  cardinalities, join fan-outs, and group sizes scale linearly exactly
  as TPC-H's own sf scaling does (nation/region stay fixed — bounded
  dims don't grow with sf);
- document TEXT is re-tokenized per replica (every word prefixed with a
  replica tag), which preserves each replica's internal near-duplicate
  structure bit-for-bit (Jaccard is invariant under a bijective token
  rename) while making CROSS-replica similarity ~0 — naive text
  replication would make every doc a 10-way near-dup cluster and blow
  the LSH pair count up ×100 at ×10 data, a superlinearity of the
  GENERATOR, not of any plan;
- embeddings are circularly shifted per replica (norm-preserving, and
  decorrelates replicas) for the same reason on the vector side.

Replica 0 is byte-identical to sf0.1. Output is NOT committed (see
.gitignore) — rerun this script after a driver testdata regeneration.

Usage: python scripts/gen_sf1.py [src_dir] [dst_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = (
    sys.argv[2]
    if len(sys.argv) > 2
    else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "testdata", "sf1")
)
REPLICAS = 10

#: key columns to stride per replica, per table
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
#: which table owns each key's stride (foreign keys reuse the owner's)
OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def generate(src: str = SRC, dst: str = DST, replicas: int = REPLICAS) -> None:
    """Importable entry (bench.py regenerates a missing sf1 with it)."""
    _run(src, dst, replicas)


def main() -> None:
    _run(SRC, DST, REPLICAS)


def _run(src: str, dst: str, replicas: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    strides: dict[tuple[str, str], int] = {}
    for key, (tbl, col) in OWNER.items():
        if (tbl, col) not in strides:
            mx = con.execute(
                f"SELECT max({col}) FROM read_parquet('{src}/{tbl}.parquet')"
            ).fetchone()[0]
            strides[(tbl, col)] = int(mx) + 1

    for tbl in ("region", "nation"):  # bounded dims: copy verbatim
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{tbl}.parquet')) "
            f"TO '{dst}/{tbl}.parquet' (FORMAT parquet)"
        )
        print(f"{tbl}: copied")

    for tbl, keys in KEYS.items():
        described = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{tbl}.parquet')"
        ).fetchall()
        cols = [r[0] for r in described]
        types = {r[0]: r[1] for r in described}
        sel = []
        for c in cols:
            if c in keys:
                stride = strides[OWNER[c]]
                sel.append(f"{c} + r.i * {stride} AS {c}")
            elif tbl == "documents" and c == "text":
                # bijective per-replica token rename: replica 0 keeps
                # the original tokens; replica i prefixes every word
                sel.append(
                    "CASE WHEN r.i = 0 THEN text ELSE "
                    "'q' || r.i || '_' || replace(text, ' ', "
                    "' q' || r.i || '_') END AS text"
                )
            elif tbl == "documents" and c == "n_chars":
                # cast back to the SOURCE column type: the CASE would
                # otherwise unify INT n_chars with length()'s BIGINT and
                # silently diverge sf1's schema from sf0.1's
                sel.append(
                    "CAST(CASE WHEN r.i = 0 THEN n_chars ELSE length("
                    "'q' || r.i || '_' || replace(text, ' ', "
                    f"' q' || r.i || '_')) END AS {types[c]}) AS n_chars"
                )
            elif tbl == "embeddings" and c == "embedding":
                # circular shift by i: norm-preserving decorrelation
                sel.append(
                    "list_concat(embedding[r.i + 1:], "
                    "embedding[1:r.i])::FLOAT[] AS embedding"
                )
            else:
                sel.append(c)
        q = (
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM read_parquet('{src}/{tbl}.parquet'), "
            f"(SELECT unnest(range({replicas})) AS i) r "
            f"ORDER BY r.i) TO '{dst}/{tbl}.parquet' (FORMAT parquet)"
        )
        con.execute(q)
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{tbl}.parquet')"
        ).fetchone()[0]
        print(f"{tbl}: {n} rows")


if __name__ == "__main__":
    main()
