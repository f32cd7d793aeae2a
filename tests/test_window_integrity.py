"""Machine-check of the DRIVER_WINDOW rotation rule (VERDICT.md
round-14 ask #8): every registry query whose implementing code changed
since the last round boundary MUST be in DRIVER_WINDOW, so its gate
row is re-verified in the same round the code changed.

"Changed" is computed by tools/query_fingerprints.py: a sha256 over
the oracle SQL + the AST-normalized (docstring-stripped) source of the
query function and its transitive data_warehouse_spark closure — an
operator edit three calls deep flags every query it can affect, while
comment/docstring edits don't flag at all. The baseline is the last
driver round-boundary commit (subject ``round N: ...``), extracted
with git archive and fingerprinted by the SAME script version, each in
its own subprocess so the two package copies never meet.
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
TOOL = REPO / "tools" / "query_fingerprints.py"


def _last_round_commit() -> str | None:
    out = subprocess.run(
        ["git", "log", "--format=%H %s"], cwd=REPO,
        capture_output=True, text=True)
    if out.returncode != 0:
        return None
    for line in out.stdout.splitlines():
        sha, _, subject = line.partition(" ")
        if subject.startswith("round ") and ":" in subject:
            return sha
    return None


def _fingerprints(root: Path) -> dict[str, str]:
    out = subprocess.run(
        [sys.executable, str(TOOL), "--root", str(root)],
        cwd=root, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout)


def test_changed_queries_are_windowed():
    boundary = _last_round_commit()
    if boundary is None:
        pytest.skip("no round-boundary commit in history")
    cur = _fingerprints(REPO)
    with tempfile.TemporaryDirectory() as td:
        tree = Path(td) / "tree"
        tree.mkdir()
        p1 = subprocess.Popen(["git", "archive", boundary], cwd=REPO,
                              stdout=subprocess.PIPE)
        subprocess.run(["tar", "-x", "-C", str(tree)], stdin=p1.stdout,
                       check=True)
        p1.wait()
        prev = _fingerprints(tree)

    from data_warehouse_spark.queries.registry import DRIVER_WINDOW

    changed = sorted(q for q in cur if prev.get(q) != cur[q])
    missing = [q for q in changed if q not in DRIVER_WINDOW]
    assert not missing, (
        f"queries changed since round boundary {boundary[:9]} but NOT "
        f"in DRIVER_WINDOW (registry.py): {missing}. Add them to the "
        "window's (b) section — the driver must re-verify changed "
        "code in the round it changed.")
    # the fingerprint layer itself must stay sensitive: at least the
    # queries the window's (b) section claims as changed should flag
    # once the round has any (b) entries committed; an empty `changed`
    # with a non-empty diff would mean the tool went blind. We can't
    # assert that here generically (early-round trees are identical),
    # so just sanity-check the tool produced a full map.
    assert len(cur) >= 150
