"""Snapshot-versioned tables: multi-version writes + time-travel reads
(U9 [cap]) without any external table format.

The reference's warehouse overwrites in place (ON CONFLICT DO UPDATE,
trips_lambda.py:180-206) — yesterday's state is gone after tonight's
load. Production warehouses keep it: auditing a report means re-reading
the table AS OF the version the report saw. Table formats (Delta,
Iceberg) provide this via manifest files over immutable data; this
module implements the same core mechanic with plain parquet + JSON
manifests, no dependencies:

  table_dir/
    data/v000001/...parquet     immutable per-version data
    _versions/v000001.json      manifest, written AFTER the data commit

Write protocol: data files land first; the manifest is then staged and
os.rename()d into place — atomic on POSIX — so a reader either sees a
complete version or not at all, and a crashed writer leaves no visible
half-version (just an orphaned data dir the next write ignores).
Readers list _versions/ and open the requested manifest's data path;
"latest" is the max version present. Old versions are immutable by
construction — a later write never touches an earlier data dir — which
is what makes time travel a metadata operation at any table size.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _versions_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_versions")


def versions(table_dir: str) -> list[int]:
    """Committed version numbers, ascending (empty for a fresh dir)."""
    vdir = _versions_dir(table_dir)
    if not os.path.isdir(vdir):
        return []
    out = []
    for f in os.listdir(vdir):
        if f.startswith("v") and f.endswith(".json"):
            out.append(int(f[1:-5]))
    return sorted(out)


def write_snapshot(df: DataFrame, table_dir: str) -> int:
    """Commit `df` as the table's next immutable version; returns the
    version number. The manifest rename is the commit point."""
    v = (versions(table_dir) or [0])[-1] + 1
    data_path = os.path.join(table_dir, "data", f"v{v:06d}")
    df.write.mode("errorifexists").parquet(data_path)
    os.makedirs(_versions_dir(table_dir), exist_ok=True)
    manifest = {"version": v, "data": data_path,
                "schema": df.schema.json()}
    staged = os.path.join(_versions_dir(table_dir),
                          f".v{v:06d}.json.tmp.{os.getpid()}")
    final = os.path.join(_versions_dir(table_dir), f"v{v:06d}.json")
    with open(staged, "w") as fh:
        json.dump(manifest, fh)
    os.rename(staged, final)  # the atomic commit
    return v


def read_snapshot(spark: SparkSession, table_dir: str,
                  version: int | None = None) -> DataFrame:
    """Time-travel read: the table AS OF `version` (default: latest)."""
    vs = versions(table_dir)
    if not vs:
        raise FileNotFoundError(f"no committed versions under {table_dir}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(f"version {v} not committed (have {vs})")
    with open(os.path.join(_versions_dir(table_dir), f"v{v:06d}.json")) as fh:
        manifest = json.load(fh)
    return spark.read.parquet(manifest["data"])
