"""Lifecycle contracts for the snapshot store (round 16, VERDICT r15
asks #1/#2): retention (expire_versions), crashed-writer GC
(gc_orphans), and erasure that composes with time travel
(erase_keys_all_versions).

What only these tests cover (the u9c/u5b registry queries cover the
oracle-checked aggregate semantics): the loud-failure contract for a
reader holding a doomed version mid-read, the never-expire-current
rule under adversarial arguments, grace/live-lock safety in GC, and
the all-rows-erased empty-version read-back.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from data_warehouse_spark.operators.snapshots import (
    _versions_dir, erase_keys_all_versions, expire_versions, gc_orphans,
    read_snapshot, versions, write_snapshot,
)


def _mk_versions(spark, table_dir: str, sizes) -> None:
    for n in sizes:
        df = spark.range(n).withColumnRenamed("id", "k")
        write_snapshot(df, table_dir)


def test_expire_keeps_current_and_fails_loud_reads(tmp_path, spark):
    table_dir = str(tmp_path / "tbl")
    _mk_versions(spark, table_dir, (10, 20, 30, 40))
    assert expire_versions(table_dir, keep_last=2) == [1, 2]
    assert versions(table_dir) == [3, 4]
    with pytest.raises(ValueError, match="expired"):
        read_snapshot(spark, table_dir, 1)
    # before_version past the end must still spare the CURRENT version
    assert expire_versions(table_dir, before_version=999) == [3]
    assert versions(table_dir) == [4]
    assert read_snapshot(spark, table_dir, 4).count() == 40
    # idempotent: nothing left to expire
    assert expire_versions(table_dir, keep_last=1) == []


def test_expire_requires_retention_args(tmp_path, spark):
    table_dir = str(tmp_path / "tbl")
    _mk_versions(spark, table_dir, (5,))
    with pytest.raises(ValueError, match="retention"):
        expire_versions(table_dir)
    with pytest.raises(ValueError, match="keep_last"):
        expire_versions(table_dir, keep_last=0)
    assert versions(table_dir) == [1]


def test_mid_read_of_expired_version_fails_loudly(tmp_path, spark):
    """A reader that resolved a version BEFORE expiry must fail loudly
    at action time — never return partial/empty data silently."""
    table_dir = str(tmp_path / "tbl")
    _mk_versions(spark, table_dir, (25, 5))
    held = read_snapshot(spark, table_dir, 1)  # lazy: plan resolved
    assert expire_versions(table_dir, keep_last=1) == [1]
    with pytest.raises(Exception, match="(?i)path|file|exist"):
        held.count()
    # the surviving version is unaffected
    assert read_snapshot(spark, table_dir, 2).count() == 5


def test_erase_composes_with_time_travel(tmp_path, spark):
    table_dir = str(tmp_path / "tbl")
    # v1 has no doomed keys (0..9 doubled to 20..38 even); v2/v3 do
    base = spark.range(10).selectExpr("id * 2 + 20 AS k", "id AS v")
    write_snapshot(base, table_dir)
    write_snapshot(spark.range(15).selectExpr("id AS k", "id AS v"),
                   table_dir)
    write_snapshot(spark.range(8).selectExpr("id AS k", "id * 10 AS v"),
                   table_dir)
    doomed = spark.createDataFrame([(2,), (3,)], "k long")
    rewritten = erase_keys_all_versions(spark, table_dir, doomed,
                                       keys=["k"])
    assert rewritten == [2, 3], "v1 is key-free and must stay untouched"
    assert versions(table_dir) == [1, 2, 3], "version numbers preserved"
    assert read_snapshot(spark, table_dir, 1).count() == 10
    for v, expect in ((2, 13), (3, 6)):
        got = read_snapshot(spark, table_dir, v)
        assert got.count() == expect
        assert got.filter("k IN (2, 3)").count() == 0, \
            f"erased key served by version {v}"
    # idempotent: a second erasure finds nothing to rewrite
    assert erase_keys_all_versions(spark, table_dir, doomed,
                                   keys=["k"]) == []


def test_erase_all_rows_leaves_readable_empty_version(tmp_path, spark):
    table_dir = str(tmp_path / "tbl")
    write_snapshot(spark.range(3).selectExpr("id AS k", "id AS v"),
                   table_dir)
    write_snapshot(spark.range(6).selectExpr("id AS k", "id AS v"),
                   table_dir)
    doomed = spark.createDataFrame([(i,) for i in range(3)], "k long")
    assert erase_keys_all_versions(spark, table_dir, doomed,
                                   keys=["k"]) == [1, 2]
    v1 = read_snapshot(spark, table_dir, 1)
    assert v1.count() == 0
    assert v1.columns == ["k", "v"], "schema survives an empty rewrite"
    assert read_snapshot(spark, table_dir, 2).count() == 3


def test_erase_missing_key_column_raises(tmp_path, spark):
    table_dir = str(tmp_path / "tbl")
    write_snapshot(spark.range(3).withColumnRenamed("id", "k"), table_dir)
    doomed = spark.createDataFrame([(1,)], "other long")
    with pytest.raises(ValueError, match="lacks key"):
        erase_keys_all_versions(spark, table_dir, doomed, keys=["other"])


def test_gc_orphans_respects_grace_and_live_locks(tmp_path, spark):
    table_dir = str(tmp_path / "tbl")
    _mk_versions(spark, table_dir, (4,))

    def plant(name: str, backdate: bool) -> str:
        d = os.path.join(table_dir, "data", name)
        os.makedirs(d)
        f = os.path.join(d, "part-0.parquet")
        with open(f, "w") as fh:
            fh.write("debris")
        if backdate:
            old = time.time() - 7200
            os.utime(f, (old, old))
            os.utime(d, (old, old))
        return d

    fresh = plant("v000050", backdate=False)   # may be in-flight: keep
    stale = plant("v000051", backdate=True)    # crashed writer: reclaim
    locked = plant("v000052", backdate=True)   # live lock: keep
    # a superseded erase rewrite of the COMMITTED v1 (manifest points
    # elsewhere; the post-swap rmtree "failed"): reclaimable
    superseded = plant("v000001.erased.999.1", backdate=True)
    lock = os.path.join(_versions_dir(table_dir), ".v000052.lock")
    with open(lock, "w") as fh:
        fh.write(str(os.getpid()))  # our own live pid

    removed = gc_orphans(table_dir, grace_s=3600)
    assert stale in removed and superseded in removed
    assert os.path.isdir(fresh) and os.path.isdir(locked)
    assert not os.path.isdir(stale) and not os.path.isdir(superseded)
    assert versions(table_dir) == [1], "GC touched committed state"
    assert read_snapshot(spark, table_dir, 1).count() == 4
    os.unlink(lock)


def test_expire_by_age_uses_commit_time(tmp_path, spark):
    """older_than_s retention (the Delta VACUUM convention): commit
    time is the manifest mtime stamped by the atomic rename. Backdate
    v1/v2's manifests; an age cut must expire exactly those — and
    still never the current version even when IT is old too."""
    table_dir = str(tmp_path / "tbl")
    _mk_versions(spark, table_dir, (5, 10, 15))
    old = time.time() - 7200
    for v in (1, 2):
        m = os.path.join(_versions_dir(table_dir), f"v{v:06d}.json")
        os.utime(m, (old, old))
    assert expire_versions(table_dir, older_than_s=3600) == [1, 2]
    assert versions(table_dir) == [3]
    # current version immune to the age cut
    m = os.path.join(_versions_dir(table_dir), "v000003.json")
    os.utime(m, (old, old))
    assert expire_versions(table_dir, older_than_s=3600) == []
    assert read_snapshot(spark, table_dir, 3).count() == 15


def test_daily_cadence_composes_with_retention_and_erasure(tmp_path, spark):
    """The operational composition a 100 TB deployment actually runs
    (the reference's daily load cadence, trips_lambda.py:218-246):
    N daily upserted snapshots -> retention (keep_last) -> GDPR
    erasure across the retained history -> time travel still serves
    every retained version, minus the erased keys, and orphan GC
    stays a no-op on the healthy table."""
    from pyspark.sql import functions as F

    from data_warehouse_spark.operators.merge import upsert

    table_dir = str(tmp_path / "daily")
    # day d upserts rows [0, 10+2d) with value = d for keys it touches
    state = None
    for d in range(1, 6):
        day = spark.range(10 + 2 * d).select(
            F.col("id").alias("k"), F.lit(d).alias("day"))
        state = day if state is None else upsert(state, day, keys=["k"])
        assert write_snapshot(state, table_dir) == d

    assert expire_versions(table_dir, keep_last=2) == [1, 2, 3]
    doomed = spark.createDataFrame([(1,), (7,)], "k long")
    assert erase_keys_all_versions(spark, table_dir, doomed,
                                   keys=["k"]) == [4, 5]
    assert versions(table_dir) == [4, 5]
    for v, day_rows in ((4, 18), (5, 20)):
        got = read_snapshot(spark, table_dir, v)
        assert got.count() == day_rows - 2
        assert got.filter("k IN (1, 7)").count() == 0
        assert got.agg({"day": "max"}).collect()[0][0] == v
    assert gc_orphans(table_dir, grace_s=0) == [], \
        "GC found debris on a healthy table"


def test_partitioned_snapshot_prunes_and_survives_erasure(tmp_path, spark):
    """r16 partitioned versions: a partition_by snapshot (1) reads
    back value-identical with the committed column order, (2) gives
    time-travel reads PARTITION PRUNING (plan-asserted: a dt filter
    reaches PartitionFilters, and the scan reads fewer files than the
    version holds), and (3) keeps its layout across an
    erase_keys_all_versions rewrite."""
    import re

    from pyspark.sql import functions as F

    table_dir = str(tmp_path / "ptbl")
    df = spark.range(300).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("dt"),
        (F.col("id") * 2).alias("v"))
    assert write_snapshot(df, table_dir, partition_by=["dt"]) == 1

    back = read_snapshot(spark, table_dir, 1)
    assert back.columns == ["k", "dt", "v"], "manifest column order"
    assert back.count() == 300
    assert back.filter("dt = '1'").count() == 100

    pruned = back.filter(F.col("dt") == "1")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "dt" in m.group(1), f"no partition pruning:\n{plan[:800]}"

    # layout on disk: one dir per dt value
    data_dir = json.loads(open(os.path.join(
        _versions_dir(table_dir), "v000001.json")).read())["data"]
    assert sorted(d for d in os.listdir(data_dir)
                  if d.startswith("dt=")) == ["dt=0", "dt=1", "dt=2"]

    doomed = spark.createDataFrame([(6,), (7,)], "k long")
    assert erase_keys_all_versions(spark, table_dir, doomed,
                                   keys=["k"]) == [1]
    back2 = read_snapshot(spark, table_dir, 1)
    assert back2.count() == 298
    assert back2.filter("k IN (6, 7)").count() == 0
    new_data = json.loads(open(os.path.join(
        _versions_dir(table_dir), "v000001.json")).read())["data"]
    assert sorted(d for d in os.listdir(new_data)
                  if d.startswith("dt=")) == ["dt=0", "dt=1", "dt=2"], \
        "erasure rewrite dropped the partitioned layout"
    # pruning still live post-rewrite
    plan2 = read_snapshot(spark, table_dir, 1).filter("dt = '2'") \
        ._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*dt", plan2)


def test_partition_by_missing_column_raises(tmp_path, spark):
    with pytest.raises(ValueError, match="partition_by"):
        write_snapshot(spark.range(3), str(tmp_path / "t"),
                       partition_by=["nope"])
