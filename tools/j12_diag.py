"""One-off diagnostic for j12's 1024x floor-free cell (round-6 ask #2).

Times the bucketed fact-fact join at an amplified fixture dir, prints
the EXECUTED (AQE-final) plan, and dumps per-stage shuffle/spill
metrics from the local UI REST API so "did a shuffle/sort/spill sneak
back in at 614M rows" is answered from evidence, not the logical plan.

Usage: python tools/j12_diag.py [--amp /tmp/floorfree/..._amp1024]
       [--query j12_bucketed_fact_join] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_warehouse_spark.queries.registry import load_all  # noqa: E402
from data_warehouse_spark.session import get_spark  # noqa: E402


def stage_metrics(ui: str) -> list[dict]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"))
    out = []
    for s in stages:
        out.append({
            "stageId": s["stageId"],
            "name": s["name"].split("\n")[0][:70],
            "tasks": s["numCompleteTasks"],
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "mem_spill_mb": round(s.get("memoryBytesSpilled", 0) / 1e6, 1),
            "disk_spill_mb": round(s.get("diskBytesSpilled", 0) / 1e6, 1),
            "exec_run_s": round(s.get("executorRunTime", 0) / 1e3, 1),
            "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
        })
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--amp", default="/tmp/floorfree/ddbe1476_amp1024")
    ap.add_argument("--query", default="j12_bucketed_fact_join")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    specs = load_all()
    spec = specs[args.query]
    # the session factory disables the UI by default; the REST stage
    # metrics below need it
    spark = get_spark("j12diag", extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl or "http://localhost:4040"

    t0 = time.time()
    spec.fn(spark, args.amp).write.format("noop").mode("overwrite").save()
    print(f"warm(+bucketed build): {time.time()-t0:.2f}s", flush=True)

    before = {s["stageId"] for s in stage_metrics(ui)}
    times = []
    df = None
    for i in range(args.runs):
        df = spec.fn(spark, args.amp)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        times.append(dt)
        print(f"run {i}: {dt:.2f}s", flush=True)
    print(f"best-of-{args.runs}: {min(times):.2f}s")

    print("\n=== executed plan (last run) ===")
    df.explain("formatted")

    print("=== stages from timed runs ===")
    for s in stage_metrics(ui):
        if s["stageId"] not in before and (
                s["exec_run_s"] > 0.5 or s["disk_spill_mb"] > 0):
            print(json.dumps(s))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
