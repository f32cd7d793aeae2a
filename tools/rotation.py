"""DRIVER_WINDOW rotation planner — the archive-derived half of the
window discipline (VERDICT.md r15 "what's wrong" #1: the displaced
list must be GENERATED from CORRECTNESS_r*.json, not hand-written;
the hand-written r15 list missed w2_lead_first_last).

Reads every CORRECTNESS_r*.json at the repo root, computes each
query's LAST hash-green round, and prints:

  - the last-green histogram (how many rows date from each round),
  - the stale-first cohort ordering (oldest last-green first, then
    registry order) — the authoritative input for composing the next
    round's DRIVER_WINDOW,
  - given ``--window`` (default: the live DRIVER_WINDOW), the
    DISPLACED list: queries whose last-green round is the oldest
    cohort but which are NOT in the window — exactly the rows the
    NEXT round's window must lead with.

Usage:
    python tools/rotation.py [--top N]

The changed-query half of the discipline (every query whose code
changed this round must be windowed) is machine-checked separately by
tests/test_window_integrity.py; this tool owns the staleness half.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def last_green(repo: Path = REPO) -> dict[str, int]:
    """query -> newest round whose CORRECTNESS file records a full
    hash-green row (rows+schema+hash all true, no error)."""
    out: dict[str, int] = {}
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.match(r"CORRECTNESS_r(\d+)\.json", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(f.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if (row.get("rows_match") and row.get("schema_match")
                    and row.get("hash_match") and not row.get("err")):
                out[name] = max(out.get(name, 0), rnd)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=60,
                    help="how many stale-first rows to print")
    args = ap.parse_args()

    from data_warehouse_spark.queries.registry import (
        DRIVER_WINDOW, load_all,
    )

    specs = load_all()
    green = last_green()
    hist: dict[int, int] = {}
    for name in specs:
        hist[green.get(name, 0)] = hist.get(green.get(name, 0), 0) + 1
    print("last-green histogram (0 = never green / new):")
    for rnd in sorted(hist):
        print(f"  r{rnd:02d}: {hist[rnd]}")

    order = {n: i for i, n in enumerate(specs)}
    stale_first = sorted(specs, key=lambda n: (green.get(n, 0), order[n]))
    print(f"\nstale-first cohort order (top {args.top}):")
    for n in stale_first[: args.top]:
        mark = "  [windowed]" if n in DRIVER_WINDOW[:50] else ""
        print(f"  r{green.get(n, 0):02d}  {n}{mark}")

    oldest = min(green.get(n, 0) for n in specs if green.get(n, 0) > 0)
    displaced = [n for n in specs
                 if green.get(n, 0) == oldest and n not in DRIVER_WINDOW[:50]]
    print(f"\noldest green cohort: r{oldest}; displaced (MUST lead the "
          f"next window): {len(displaced)}")
    for n in displaced:
        print(f"  {n}")
    return 0


if __name__ == "__main__":
    main()
