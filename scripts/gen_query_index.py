#!/usr/bin/env python
"""Generate QUERIES.md: one line per registered query — gate-window
position, oracle kind, and the first docstring sentence. Run after
adding queries; the index is committed so reviewers can survey the
whole surface without reading plans/queries.py."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asset_prices_parquet_saver_spark.plans import ORACLE, QUERIES  # noqa: E402


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    for stop in (". ", ".\n"):
        if stop in text:
            return text.split(stop)[0] + "."
    return text[:160]


def main() -> None:
    names = list(QUERIES)
    lines = [
        "# Query index",
        "",
        f"{len(names)} registered queries; the driver's correctness gate "
        "evaluates the first 50 (the value-hash window). `hash` = full "
        "row/schema/value-hash oracle; `rows` = rows-only by design.",
        "",
        "| # | query | check | summary |",
        "|---|---|---|---|",
    ]
    for i, n in enumerate(names, 1):
        kind = "hash" if n in ORACLE else "rows"
        marker = "" if i <= 50 else " (local)"
        doc = first_sentence(QUERIES[n].__doc__)
        if not doc:
            # older queries document via section comments in
            # plans/queries.py; point there rather than duplicating
            doc = "see plans/queries.py"
        doc = doc.replace("|", "\\|")
        lines.append(f"| {i}{marker} | `{n}` | {kind} | {doc} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(names)} queries")


if __name__ == "__main__":
    main()
