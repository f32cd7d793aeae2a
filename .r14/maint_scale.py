"""Write-path maintenance scale lanes (round-14, VERDICT r13 ask #4).

u5/u6/u8's sf0.1 FLOORFREE-style ratios are uninterpretable by
construction — the DuckDB oracle runs a SELECT while Spark physically
rewrites files — so these are SPARK-ONLY scaling curves plus the
existing content-identity checks. The claim each lane tests is the
actual 100 TB claim:

  u5 delete_by_keys   — rewrite cost is proportional to AFFECTED
                        partitions, not the table. Two sweeps:
                        (k-sweep) fixed 1024-day table, doomed keys
                        confined to k in {4,16,64,256} days -> wall
                        grows with k, files_touched/files_total = k/D;
                        (D-sweep) fixed k=4 affected days, table grows
                        D in {64,256,1024} days -> wall ~flat except
                        the column-pruned discovery scan (timed
                        separately so its O(table) share is explicit).
  u6 compact_partitions — dates-scoped OPTIMIZE cost is proportional
                        to the partitions compacted: same 1024-day
                        8-files/day fragmented table, compact k in
                        {4,16,64,256} dates -> wall vs k, file count
                        k*8 -> k.
  u8 write_zordered   — the layout build is an unavoidable one-time
                        linear rewrite (wall vs 16x/64x/256x amplified
                        events), and the payoff is measured on the
                        same data: the 2-D box scan on the z-ordered
                        layout vs a round-robin layout of identical
                        rows (wall + parquet row-group pruning doing
                        real work).

The day-scaled base tables are synthesized here (the gate fixtures
span a fixed date range, so the amplifier structurally cannot grow the
PARTITION COUNT — this lane needs exactly that axis); content identity
is asserted against pre-computed aggregates of the same synthetic
rows, the u5/u6 oracle discipline. Timings are best-of-2 with the
mutated partitions restored from a pristine copy between runs (a
rewrite consumes its input; re-timing without restore would measure a
different table).

Output: .r14/maint_scale.json + SCALE.md tables.
"""

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from data_warehouse_spark.operators.bucketing import (  # noqa: E402
    write_zordered, zorder_cell, zorder_key,
)
from data_warehouse_spark.operators.maintenance import (  # noqa: E402
    compact_partitions, delete_by_keys,
)
from data_warehouse_spark.session import get_spark  # noqa: E402
from tools.floorfree import build_amplified  # noqa: E402

LANE = Path("/tmp/maint_scale")
ROWS_PER_DAY = 25_000
spark = get_spark("maintscale")


def day_table(days: int):
    """events-shaped synthetic: ROWS_PER_DAY rows per calendar day,
    user_id encodes the day (user day*1000+i) so a doomed-key set can
    be confined to exactly k partitions."""
    n = days * ROWS_PER_DAY
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.floor(F.col("id") / ROWS_PER_DAY) * 1000
         + F.col("id") % 1000).alias("user_id"),
        (F.col("id") % 5).cast("string").alias("event_type"),
        (F.col("id") % 9973 / 100.0).alias("value"),
        F.date_add(F.lit("2020-01-01").cast("date"),
                   F.floor(F.col("id") / ROWS_PER_DAY).cast("int"))
        .alias("dt"))
    return df


def build_base(days: int, files_per_day: int, tag: str) -> Path:
    path = LANE / f"{tag}_d{days}_f{files_per_day}"
    if (path / "_PRISTINE").exists():
        return path
    df = day_table(days)
    if files_per_day == 1:
        df = df.repartition(F.col("dt"))
    else:
        df = df.repartition(files_per_day)
    (df.write.mode("overwrite").partitionBy("dt")
       .parquet(str(path / "table")))
    shutil.copytree(path / "table", path / "pristine")
    (path / "_PRISTINE").touch()
    return path


def restore(base: Path, dts: list[str] | None = None) -> None:
    """Copy partitions back from the pristine copy (all when dts is
    None) so a second timed run sees the identical input table."""
    table, pristine = base / "table", base / "pristine"
    dirs = ([f"dt={d}" for d in dts] if dts is not None
            else [p.name for p in pristine.iterdir()
                  if p.name.startswith("dt=")])
    for d in dirs:
        if (table / d).exists():
            shutil.rmtree(table / d)
        shutil.copytree(pristine / d, table / d)
    spark.catalog.refreshByPath(str(table))


def table_files(path: Path) -> int:
    return sum(1 for p in path.rglob("*.parquet"))


def agg_state(path: str):
    return sorted((r.event_type, r.n, r.s) for r in
                  spark.read.parquet(path)
                  .groupBy("event_type")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.sum(F.round(F.col("value") * 100)
                             .cast("long")).alias("s")).collect())


def dts_of_days(days: list[int]) -> list[str]:
    import datetime
    d0 = datetime.date(2020, 1, 1)
    return [(d0 + datetime.timedelta(days=d)).isoformat() for d in days]


out: dict = {"u5": {"k_sweep": [], "d_sweep": []},
             "u6": {"k_sweep": []}, "u8": {"build": [], "scan": []}}

# ---------------- u5: delete_by_keys ----------------
D_BIG = 1024
base = build_base(D_BIG, 1, "u5")
tbl = str(base / "table")
files_total = table_files(base / "table")
for k in (4, 16, 64, 256):
    affected_days = list(range(k))
    doomed = (day_table(D_BIG)
              .filter((F.floor(F.col("event_id") / ROWS_PER_DAY) < k)
                      & (F.col("user_id") % 7 == 0))
              .select("user_id").localCheckpoint())
    n_doomed_users = doomed.distinct().count()
    expected = [(t, n - dn, s - ds) for (t, n, s), (_, dn, ds) in zip(
        agg_state(tbl),
        sorted((r.event_type, r.n, r.s) for r in
               day_table(D_BIG)
               .filter((F.floor(F.col("event_id") / ROWS_PER_DAY) < k)
                       & (F.col("user_id") % 7 == 0))
               .groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(F.round(F.col("value") * 100)
                          .cast("long")).alias("s")).collect()))]
    wall = None
    for run in range(2):
        t0 = time.time()
        delete_by_keys(spark, tbl, doomed, keys=["user_id"])
        wall = min(wall or 1e9, time.time() - t0)
        got = agg_state(tbl)
        assert got == expected, f"u5 k={k} run={run}: content mismatch"
        restore(base, dts_of_days(affected_days))
    row = {"days_total": D_BIG, "days_affected": k,
           "files_total": files_total, "files_touched": k,
           "doomed_users": n_doomed_users, "wall_s": round(wall, 2)}
    out["u5"]["k_sweep"].append(row)
    print("u5 k_sweep", json.dumps(row), flush=True)

# D-sweep: fixed 4 affected days, growing table; the discovery
# (column-pruned dt+keys semi-join scan) is the one O(table) term —
# timed separately so the rewrite share is explicit
for D in (64, 256, 1024):
    b = build_base(D, 1, "u5")
    t = str(b / "table")
    doomed = (day_table(D)
              .filter((F.floor(F.col("event_id") / ROWS_PER_DAY) < 4)
                      & (F.col("user_id") % 7 == 0))
              .select("user_id").localCheckpoint())
    disc = None
    for _ in range(3):
        t0 = time.time()
        target = spark.read.parquet(t)
        dk = doomed.distinct()
        (target.select("dt", "user_id")
         .join(dk, on=[target["user_id"].eqNullSafe(dk["user_id"])],
               how="left_semi").select("dt").distinct().collect())
        disc = min(disc or 1e9, time.time() - t0)
    wall = None
    for run in range(2):
        t0 = time.time()
        delete_by_keys(spark, t, doomed, keys=["user_id"])
        wall = min(wall or 1e9, time.time() - t0)
        restore(b, dts_of_days(list(range(4))))
    row = {"days_total": D, "days_affected": 4,
           "rows_total": D * ROWS_PER_DAY,
           "files_total": table_files(b / "table"), "files_touched": 4,
           "discovery_scan_s": round(disc, 2), "wall_s": round(wall, 2),
           "rewrite_minus_discovery_s": round(wall - disc, 2)}
    out["u5"]["d_sweep"].append(row)
    print("u5 d_sweep", json.dumps(row), flush=True)

# ---------------- u6: compact_partitions(dates=...) ----------------
fbase = build_base(D_BIG, 8, "u6")
ftbl = str(fbase / "table")
frag_files = table_files(fbase / "table")
state_before = agg_state(ftbl)
for k in (4, 16, 64, 256):
    import datetime
    dates = dts_of_days(list(range(k)))
    date_objs = [datetime.date.fromisoformat(d) for d in dates]
    wall = None
    for run in range(2):
        t0 = time.time()
        compact_partitions(spark, ftbl, dates=date_objs)
        wall = min(wall or 1e9, time.time() - t0)
        assert agg_state(ftbl) == state_before, f"u6 k={k}: content"
        restore(fbase, dates)
    row = {"days_total": D_BIG, "days_compacted": k,
           "files_before_in_scope": 8 * k, "files_after_in_scope": k,
           "files_total": frag_files, "wall_s": round(wall, 2)}
    out["u6"]["k_sweep"].append(row)
    print("u6 k_sweep", json.dumps(row), flush=True)

# ---------------- u8: write_zordered build + scan payoff ------------
for m in (16, 64, 256):
    amp = build_amplified(spark, "/root/testdata/sf0.1", "/tmp/floorfree",
                          m, tables=["events"])
    ev = (spark.read.parquet(f"{amp}/events.parquet")
          .select("event_id", "value",
                  F.expr("value % 90").alias("lat"),
                  F.expr("(event_id % 36000) / 100.0 - 180.0")
                  .alias("lon")))
    b = ev.agg(F.min("lat"), F.max("lat"),
               F.min("lon"), F.max("lon")).first()
    zk = zorder_key(zorder_cell(F.col("lat"), b[0], b[1]),
                    zorder_cell(F.col("lon"), b[2], b[3]))
    zpath = str(LANE / f"u8_z_{m}")
    rpath = str(LANE / f"u8_rr_{m}")
    wall = None
    for _ in range(2):
        t0 = time.time()
        write_zordered(ev, zpath, zk, n_files=32)
        wall = min(wall or 1e9, time.time() - t0)
    # round-robin control layout of the same rows, untimed
    ev.repartition(32).write.mode("overwrite").parquet(rpath)
    row = {"mult": m, "rows": m * 100_000, "zorder_write_s": round(wall, 2)}
    out["u8"]["build"].append(row)
    print("u8 build", json.dumps(row), flush=True)

    def box_agg(path):
        d = spark.read.parquet(path)
        return (d.filter((F.col("lat") >= 10) & (F.col("lat") < 20)
                         & (F.col("lon") >= -50) & (F.col("lon") < -30))
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.round(F.col("value") * 100).cast("long"))
                     .alias("s"),
                     F.min("event_id").alias("mn"),
                     F.max("event_id").alias("mx")))

    tz = tr = None
    for _ in range(3):
        t0 = time.time()
        box_agg(zpath).write.format("noop").mode("overwrite").save()
        tz = min(tz or 1e9, time.time() - t0)
        t0 = time.time()
        box_agg(rpath).write.format("noop").mode("overwrite").save()
        tr = min(tr or 1e9, time.time() - t0)
    za, ra = box_agg(zpath).first(), box_agg(rpath).first()
    assert tuple(za) == tuple(ra), f"u8 m={m}: layouts disagree"
    row = {"mult": m, "box_rows": za.n,
           "scan_zordered_s": round(tz, 3),
           "scan_roundrobin_s": round(tr, 3),
           "scan_speedup": round(tr / tz, 2)}
    out["u8"]["scan"].append(row)
    print("u8 scan", json.dumps(row), flush=True)

(REPO / ".r14" / "maint_scale.json").write_text(
    json.dumps(out, indent=2) + "\n")
print("done")
