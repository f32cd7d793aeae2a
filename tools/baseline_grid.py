"""Regenerate BASELINE.md's per-query sf0.1 grid from the live registry.

Round-7 replacement for the hand-maintained round-3 table: every
oracle-bearing registry query gets a fresh (DuckDB s, Spark s, ratio)
row on the CURRENT fixtures, so the grid can no longer drift from the
registry (a13/dq1/u7-class additions had no row for four rounds).

Protocol (same conventions as the round-3 grid and bench.py):
  - DuckDB: the query's oracle_sql on the sf dir views, warm second run.
  - Spark: the registry fn with a noop sink, best-of-2 after one
    untimed warm run (plan + page cache); one shared session,
    sf0.001 warm-up pass first.
  - x8 (iterative) and st1/st5/st8/st9 (real streaming machinery) are
    measured too but rendered in their own sections, as before.

Rewrites BASELINE.md in place between the generated-table markers.

Usage: python tools/baseline_grid.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import datetime
import json
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from data_warehouse_spark.queries.registry import load_all  # noqa: E402
from data_warehouse_spark.session import (  # noqa: E402
    ARROW_BATCH_DEFAULT, get_spark, set_arrow_batch,
)
from tools.parity import duck_connection  # noqa: E402

ITERATIVE = {"x8_dup_components"}
STREAMING = {"st1_stream_source", "st5_watermark_late_drop",
             "st8_custom_stateful", "st9_stream_stream_join",
             "u3_microbatch_write"}


def measure(sf_dir: str) -> dict[str, dict[str, float]]:
    specs = load_all()
    names = sorted(n for n, s in specs.items() if s.oracle)
    con = duck_connection(sf_dir)
    spark = get_spark("baseline_grid")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the session + loaders on the tiny fixture
    for n in names[:3]:
        specs[n].fn(spark, "/root/testdata/sf0.001") \
            .write.format("noop").mode("overwrite").save()

    out: dict[str, dict[str, float]] = {}
    for n in names:
        spec = specs[n]
        con.sql(spec.oracle).fetchall()  # warm
        t0 = time.time()
        con.sql(spec.oracle).fetchall()
        duck_s = time.time() - t0

        # reset the Arrow batch tier between queries, like the driver
        # harness does — otherwise a blob/vector tier pinned by an
        # earlier query's build leaks into this one's measured runs
        set_arrow_batch(spark, ARROW_BATCH_DEFAULT)
        spec.fn(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()  # warm (plan + cache)
        spark_s = min(_timed(spec.fn, spark, sf_dir) for _ in range(2))
        out[n] = {"duckdb_s": round(duck_s, 3), "spark_s": round(spark_s, 3)}
        print(f"| {n} | {duck_s:.3f} | {spark_s:.3f} |", flush=True)
    return out


def _timed(fn, spark, sf_dir) -> float:
    set_arrow_batch(spark, ARROW_BATCH_DEFAULT)
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def render(rows: dict[str, dict[str, float]], sf_dir: str) -> str:
    stamp = datetime.date.today().isoformat()
    batch = {n: v for n, v in rows.items()
             if n not in ITERATIVE and n not in STREAMING}
    tot_d = sum(v["duckdb_s"] for v in batch.values())
    tot_s = sum(v["spark_s"] for v in batch.values())
    med_s = sorted(v["spark_s"] for v in batch.values())[len(batch) // 2]

    def ratio(v):
        if v["duckdb_s"] <= 0:
            return "-"
        r = v["spark_s"] / v["duckdb_s"]
        cell = f"{r:.1f}x"
        return f"**{r:.2f}x — Spark ahead**" if r < 1 else cell

    def _current_round() -> str:
        # the driver stamps the round into PROGRESS.jsonl; env wins
        env = os.environ.get("SPARK_GRAFT_ROUND")
        if env:
            return env
        try:
            last = (REPO / "PROGRESS.jsonl").read_text().strip() \
                .splitlines()[-1]
            return str(json.loads(last)["round"])
        except Exception:
            return "?"

    lines = [
        f"## Measured baseline (sf0.1, local[32], regenerated {stamp}, "
        f"round {_current_round()})",
        "",
        "Full-registry regeneration on the current fixtures via "
        "`tools/baseline_grid.py` (the round-3 grid predated "
        "a13/dq1/u7-class queries and a fixture regeneration; git "
        "history keeps it). Protocol unchanged: identical semantics in "
        "both engines — DuckDB runs each query's `oracle_sql()` (warm, "
        "second run); Spark runs the registry query with a noop sink "
        "after a warm run, best-of-2, one shared local[32] session. "
        f"{len(batch)} batch queries below; the iterative and "
        "real-streaming entries follow in their own tables. "
        "Cross-round aggregates are a BAND, not a point: single-run "
        "cell noise on this box is +-10-20%, and the registry's "
        "composition moves between rounds (r8: 76.2/122.4 = 0.62x "
        "over 119; a mid-r10 grid on the pre-fix tree read 91.1 s "
        "Spark, 14.0 s of it a8_approx_agg's since-fixed "
        "ObjectHashAggregate sort-fallback — countDistinct and "
        "percentile sketches now aggregate in separate branches).",
        "",
        f"Totals: **Spark {tot_s:.1f} s vs DuckDB {tot_d:.1f} s "
        f"({tot_s / tot_d:.2f}x)**; median Spark query {med_s:.2f} s.",
        "",
        "Reading the ratios: at sf0.1 most Spark times are the "
        "local-mode **per-job floor** (~0.1-0.5 s of task scheduling, "
        "AQE planning, shuffle setup) — DuckDB's in-process execution "
        "has no such floor. The floor is constant in data size, so the "
        "floor-free bench (SCALE.md, FLOORFREE.json) is the "
        "engine-vs-engine comparison.",
        "",
        "| query ID | DuckDB s | Spark s | ratio |",
        "|---|---|---|---|",
    ]
    for n, v in sorted(batch.items()):
        lines.append(f"| {n} | {v['duckdb_s']:.3f} | {v['spark_s']:.3f} "
                     f"| {ratio(v)} |")

    lines += [
        "",
        "Iterative connected-components (Spark: min-label propagation "
        "rounds; DuckDB: recursive CTE — the shape where per-round set "
        "growth hurts a single-node engine first):",
        "",
        "| query ID | DuckDB s | Spark s | ratio |",
        "|---|---|---|---|",
    ]
    for n in sorted(ITERATIVE & rows.keys()):
        v = rows[n]
        r = v["spark_s"] / v["duckdb_s"]
        lines.append(f"| {n} | {v['duckdb_s']:.1f} | {v['spark_s']:.1f} | "
                     f"**{r:.2f}x — Spark {1 / r:.0f}x ahead** |")
    lines += [
        "",
        "Streaming-machinery queries (real Structured Streaming runs: "
        "file source, checkpoints, state store; DuckDB column = the "
        "final-state SQL):",
        "",
        "| query ID | DuckDB s | Spark s |",
        "|---|---|---|",
    ]
    for n in sorted(STREAMING & rows.keys()):
        v = rows[n]
        lines.append(f"| {n} | {v['duckdb_s']:.3f} | {v['spark_s']:.3f} |")
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    rows = measure(args.sf)
    (REPO / "BASELINE_GRID.json").write_text(
        json.dumps({"sf_dir": args.sf, "rows": rows}) + "\n")

    path = REPO / "BASELINE.md"
    text = path.read_text()
    # replace from the measured-baseline header through the end of the
    # streaming table (the prose after it is history notes, kept)
    m = re.search(r"## Measured baseline \(sf0\.1.*?\n", text)
    start = m.start()
    after = text.index("Headline bench (`bench.py`", start)
    new = render(rows, args.sf) + "\n\n"
    path.write_text(text[:start] + new + text[after:])
    print(f"rewrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
