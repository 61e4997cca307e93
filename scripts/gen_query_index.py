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


def comment_summaries() -> dict[str, str]:
    """Fallback summaries harvested from the `# ---` comment block
    directly above each @q registration in plans/queries.py."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "asset_prices_parquet_saver_spark",
        "plans",
        "queries.py",
    )
    lines = open(path).read().splitlines()
    out: dict[str, str] = {}
    for i, ln in enumerate(lines):
        if not ln.startswith("@q("):
            continue
        # query name: inline @q("name"...) or on the next line
        import re

        m = re.search(r'@q\(\s*"([a-z0-9_]+)"', ln)
        if not m and i + 1 < len(lines):
            m = re.search(r'^\s*"([a-z0-9_]+)"', lines[i + 1])
        if not m:
            continue
        name = m.group(1)
        # walk back over the contiguous comment block
        j = i - 1
        block: list[str] = []
        while j >= 0 and lines[j].lstrip().startswith("#"):
            block.append(lines[j].lstrip().lstrip("#").strip())
            j -= 1
        if block:
            text = " ".join(reversed(block)).lstrip("- ").strip()
            if text:
                out[name] = text
    return out


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    import re

    text = " ".join(doc.split())  # whitespace-normalized: ".\n" cannot occur
    # sentence end = period + space NOT preceded by a common abbreviation
    # (a bare ". " split truncated docstrings at "e.g."/"vs." into
    # fragment summaries in the committed index)
    m = re.search(r"(?<!\be\.g)(?<!\bi\.e)(?<!\bvs)(?<!\betc)(?<!\bcf)\. ", text)
    if m:
        return text[: m.start() + 1]
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
    fallbacks = comment_summaries()
    for i, n in enumerate(names, 1):
        kind = "hash" if n in ORACLE else "rows"
        marker = "" if i <= 50 else " (local)"
        doc = first_sentence(QUERIES[n].__doc__) or first_sentence(
            fallbacks.get(n)
        ) or "see plans/queries.py"
        doc = doc.replace("|", "\\|")
        lines.append(f"| {i}{marker} | `{n}` | {kind} | {doc} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(names)} queries")


if __name__ == "__main__":
    main()
