"""Streaming exactly-once under a HARD kill (round-13, VERDICT r12
ask #6): SIGKILL the Spark JVM while a foreachBatch sink is mid-write,
restart from the checkpoint, and assert the replayed micro-batch
commits idempotently — final state identical to one clean run, no
duplicate and no lost upserts.

What this adds over tests/test_streaming.py's crash test: that test
raises a Python EXCEPTION after the data commit, which Spark handles
gracefully (abort paths run, the JVM shuts down clean). Here the JVM
dies by SIGKILL with no cleanup — the footprint a preempted executor
host or an OOM-killed driver leaves: possibly half-moved dynamic-
partition-overwrite staging, orphan _temporary dirs, a checkpoint
whose last epoch never committed. The restart must converge anyway.
Companion to tests/test_snapshot_concurrency.py, which tortures the
snapshot store's commit protocol the same way with stub writers; this
file tortures the two REAL streaming sinks (ST7 merge-per-batch, U3
append-per-epoch) end-to-end.

Both sinks run in CHILD processes (own python + own JVM) so the kill
cannot take the pytest session down with it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = str(Path(__file__).resolve().parent.parent)

# The child driver: stages nothing itself — the parent prepares the
# source; the child either (crash mode) runs the stream with a watcher
# thread that SIGKILLs the JVM at the first target-directory write
# activity after epoch 0 committed, or (resume mode) just runs the
# stream to completion on the same checkpoint.
_CHILD = r"""
import os, signal, sys, threading, time
sys.path.insert(0, %(repo)r)

mode, sink, staged, target, marker_dir = sys.argv[1:6]

from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "2")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from data_warehouse_spark.streaming import jobs

SCHEMA = ("event_id long, user_id long, event_type string, "
          "ts timestamp, value double")
stream = (spark.readStream.format("parquet").schema(SCHEMA)
          .option("maxFilesPerTrigger", 1).load(staged))


def descendants_named_java():
    pids, out = {os.getpid()}, []
    while True:
        grew = False
        for p in os.listdir("/proc"):
            if not p.isdigit() or int(p) in pids:
                continue
            try:
                with open(f"/proc/{p}/stat") as fh:
                    parts = fh.read().split()
                ppid, comm = int(parts[3]), parts[1]
            except OSError:
                continue
            if ppid in pids:
                pids.add(int(p)); grew = True
                if "java" in comm:
                    out.append(int(p))
        if not grew:
            return out


def tree_snapshot(root):
    seen = set()
    for dirpath, dirnames, filenames in os.walk(root):
        for n in dirnames + filenames:
            seen.add(os.path.join(dirpath, n))
    return seen


if mode == "crash":
    done0 = os.path.join(marker_dir, "epoch0_done")
    killed_note = os.path.join(marker_dir, "kill_flavor")

    if sink == "merge":
        def hook(epoch_id):
            if epoch_id == 0:
                open(done0, "w").write("1")

        jobs._st7_post_batch_hook = hook

        def epoch0_committed():
            return os.path.exists(done0)
    else:
        # the append sink has no test hook; its own commit log IS the
        # epoch-0-committed signal (one record per committed epoch)
        commit_log = os.path.join(marker_dir, "commits.jsonl")

        def epoch0_committed():
            try:
                with open(commit_log) as fh:
                    return sum(1 for _ in fh) >= 1
            except OSError:
                return False

    def watcher():
        while not epoch0_committed():
            time.sleep(0.001)
        base = tree_snapshot(target) if os.path.exists(target) else set()
        while True:
            cur = tree_snapshot(target) if os.path.exists(target) else set()
            new = cur - base
            if new:
                staging = any(".spark-staging" in p or "_temporary" in p
                              for p in new)
                with open(killed_note, "w") as fh:
                    fh.write("mid-write-staging" if staging
                             else "mid-write-files")
                for j in descendants_named_java():
                    os.kill(j, signal.SIGKILL)
                os.kill(os.getpid(), signal.SIGKILL)
            time.sleep(0.001)

    threading.Thread(target=watcher, daemon=True).start()

if sink == "merge":
    q = jobs.run_foreach_batch_upsert(
        stream.select("user_id", "event_type", "ts", "value"),
        target, keys=["user_id", "event_type", "ts"])
else:
    q = jobs.run_microbatch_append(
        stream, target, os.path.join(marker_dir, "commits.jsonl"))
q.awaitTermination()
print("CHILD_DONE", flush=True)
""" % {"repo": REPO}


def _run_child(tmp_path, mode, sink, staged, target, marker_dir,
               expect_kill):
    script = tmp_path / f"child_{mode}_{sink}.py"
    script.write_text(_CHILD)
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="2g")
    r = subprocess.run(
        [sys.executable, str(script), mode, sink, staged, target,
         marker_dir],
        capture_output=True, text=True, timeout=600, env=env)
    if expect_kill:
        assert r.returncode != 0, (
            "crash child exited clean — the watcher never fired:\n"
            + r.stdout[-2000:] + r.stderr[-2000:])
    else:
        assert r.returncode == 0 and "CHILD_DONE" in r.stdout, (
            f"resume child failed rc={r.returncode}:\n"
            + r.stdout[-2000:] + r.stderr[-2000:])
    return r


def _stage_source(spark, sf_dir, out):
    """4 source files with interleaved keys and dates, so later epochs
    UPDATE rows earlier epochs wrote (the merge is non-trivial) and
    each epoch's dynamic overwrite touches several partitions."""
    from data_warehouse_spark.io import load_table
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value")
    ev.repartition(4, "event_id").write.mode("overwrite").parquet(out)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 4
    return out


@pytest.mark.slow  # r17: heavyweight lane, out of the default driver gate (pytest.ini)
@pytest.mark.parametrize("sink", ["merge", "append"])
def test_sigkill_mid_batch_then_checkpoint_replay(spark, sf_dir,
                                                  tmp_path, sink):
    staged = _stage_source(spark, sf_dir, str(tmp_path / "staged"))
    marker = str(tmp_path / "marker")
    os.makedirs(marker)

    # clean single-run baseline, in-session (same code path, no kill)
    from data_warehouse_spark.streaming import jobs
    base_target = str(tmp_path / "baseline" / "t")
    base_stream = (spark.readStream.format("parquet")
                   .schema("event_id long, user_id long, "
                           "event_type string, ts timestamp, "
                           "value double")
                   .option("maxFilesPerTrigger", 1).load(staged))
    if sink == "merge":
        jobs.run_foreach_batch_upsert(
            base_stream.select("user_id", "event_type", "ts", "value"),
            base_target,
            keys=["user_id", "event_type", "ts"]).awaitTermination()
    else:
        jobs.run_microbatch_append(
            base_stream, base_target,
            str(tmp_path / "baseline" / "commits.jsonl")
        ).awaitTermination()

    # crash run: child JVM SIGKILLed at the first write activity after
    # epoch 0 committed — mid-epoch-1, no abort paths, no cleanup
    target = str(tmp_path / "crashy" / "t")
    _run_child(tmp_path, "crash", sink, staged, target, marker,
               expect_kill=True)
    flavor = Path(marker, "kill_flavor")
    assert flavor.exists(), "kill fired before any epoch-1 write — " \
        "the mid-write window was never exercised"

    # restart from the same checkpoint: the half-written epoch replays
    _run_child(tmp_path, "resume", sink, staged, target, marker,
               expect_kill=False)

    def rows(path):
        df = spark.read.parquet(path)
        cols = [c for c in df.columns if c != "epoch"]
        return sorted(map(tuple, df.select(*cols).collect()))

    got, want = rows(target), rows(base_target)
    assert len(got) == len(want), (
        f"{sink}: {len(got)} rows after kill+replay vs {len(want)} "
        f"clean (kill flavor: {flavor.read_text()})")
    assert got == want, f"{sink}: state diverged after kill+replay"

    if sink == "append":
        # the commit log's replay idempotence: every VISIBLE epoch
        # recorded exactly once, and recorded rows sum to the total
        recs = {}
        with open(Path(marker, "commits.jsonl")) as fh:
            for line in fh:
                rec = json.loads(line)
                recs[rec["epoch"]] = rec  # replace = the documented
                # epoch-idempotent semantics; duplicates of an epoch
                # must at least agree on the row count
        assert sum(r["rows"] for r in recs.values()) == len(want)
