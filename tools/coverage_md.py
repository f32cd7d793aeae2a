"""Regenerate COVERAGE.md's query table from the live registry.

The prose header is kept verbatim (everything above the table); the
table and total line are re-emitted in registry order so the numbering
and driver-window annotation can never drift from
``queries/registry.py``. Row summaries come from each spec's doc
(first sentence-ish chunk, pipe-escaped).

Usage: python tools/coverage_md.py   (rewrites COVERAGE.md in place)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from data_warehouse_spark.queries.registry import load_all  # noqa: E402

WINDOW = 50  # driver's correctness gate checks the first 50 entries


def summarize(doc: str, limit: int = 220) -> str:
    text = " ".join(doc.split()).replace("|", "\\|")
    return text if len(text) <= limit else text[: limit - 2] + " …"


def main() -> int:
    path = REPO / "COVERAGE.md"
    head = []
    for line in path.read_text().splitlines():
        if re.match(r"\| *# *\|", line):
            break
        head.append(line)
    while head and not head[-1].strip():
        head.pop()

    rows = ["| # | registry ID | correctness check | summary |",
            "|---|---|---|---|"]
    specs = load_all()
    n_oracle = 0
    for i, (name, spec) in enumerate(specs.items(), 1):
        check = "DuckDB hash" if spec.oracle else "rows-only"
        n_oracle += spec.oracle is not None
        num = f"{i} (in driver window)" if i <= WINDOW else str(i)
        rows.append(f"| {num} | {name} | {check} | {summarize(spec.doc)} |")

    total = (f"Total: {len(specs)} queries, {n_oracle} with DuckDB oracles; "
             f"entries 1-{WINDOW} fall inside the driver's per-round "
             "correctness window.")
    path.write_text("\n".join(head) + "\n\n" + "\n".join(rows)
                    + "\n\n" + total + "\n")
    print(f"wrote {path}: {len(specs)} rows, {n_oracle} oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
