"""Snapshot-lifecycle operators under amplification (round 16): the
scale claims in expire_versions / erase_keys_all_versions, measured.

Claims on trial (operators/snapshots.py):
  1. expire_versions is a METADATA decision plus O(expired bytes) of
     deletes — its wall must not scale with the SURVIVING data.
  2. erase_keys_all_versions is O(versions holding the keys): a
     version with no doomed key costs one column-pruned semi-probe,
     not a rewrite — so the lane builds v1 key-free and compares its
     probe cost against v2/v3's probe+rewrite cost.
  3. Versioned-table reads are unaffected by lifecycle ops (the
     surviving version's aggregate before == after).

Table shape per multiplier M (events from the shared floorfree amp
artifacts): v1 = user_id % 7 != 0 slice (key-free by construction),
v2 = event_id % 3 != 0 slice, v3 = full table. Erase keys =
user_id % 7 == 0 (~14% of rows; hits v2 and v3 only).

Usage: python .r16/snap_lifecycle_scale.py <mult>
Prints one JSON line per phase. One process per multiplier; never
timed concurrently with other engines/jobs.
"""
from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from data_warehouse_spark.io import load_table  # noqa: E402
from data_warehouse_spark.operators.snapshots import (  # noqa: E402
    erase_keys_all_versions, expire_versions, read_snapshot,
    write_snapshot,
)
from data_warehouse_spark.session import get_spark  # noqa: E402

MULT = int(sys.argv[1])
AMP = f"/tmp/floorfree/ddbe1476_amp{MULT}"
TABLE = f"/tmp/snap_scale/amp{MULT}"

spark = get_spark("snap_scale")
ev = load_table(spark, AMP, "events").select(
    "event_id", "user_id", "event_type", "value")
n_rows = ev.count()

shutil.rmtree(TABLE, ignore_errors=True)
t0 = time.time()
write_snapshot(ev.filter(F.col("user_id") % 7 != 0), TABLE)
write_snapshot(ev.filter(F.col("event_id") % 3 != 0), TABLE)
write_snapshot(ev, TABLE)
t_write = time.time() - t0

doomed = ev.filter(F.col("user_id") % 7 == 0).select("user_id").distinct()

t0 = time.time()
rewritten = erase_keys_all_versions(spark, TABLE, doomed, keys=["user_id"])
t_erase = time.time() - t0
assert rewritten == [2, 3], rewritten  # v1 skipped via the probe

# probe-only cost in isolation: erase again — all three versions now
# hold no doomed key, so the wall is three semi-probes and zero writes
t0 = time.time()
assert erase_keys_all_versions(spark, TABLE, doomed,
                               keys=["user_id"]) == []
t_probe_only = time.time() - t0

# readback integrity + a survivor aggregate BEFORE expiry
agg_before = read_snapshot(spark, TABLE, 3).groupBy().agg(
    F.count(F.lit(1)).alias("n")).collect()[0]["n"]

t0 = time.time()
assert expire_versions(TABLE, keep_last=1) == [1, 2]
t_expire = time.time() - t0

agg_after = read_snapshot(spark, TABLE, 3).groupBy().agg(
    F.count(F.lit(1)).alias("n")).collect()[0]["n"]
assert agg_before == agg_after, (agg_before, agg_after)

print(json.dumps({
    "mult": MULT, "events_rows": n_rows,
    "write_3_versions_s": round(t_write, 2),
    "erase_2_of_3_versions_s": round(t_erase, 2),
    "probe_only_3_versions_s": round(t_probe_only, 2),
    "expire_2_versions_s": round(t_expire, 3),
    "survivor_rows": agg_after,
}))
shutil.rmtree(TABLE, ignore_errors=True)
