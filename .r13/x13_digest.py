"""One-off (round-13, VERDICT r12 ask #2): value-verify the
x13_decontaminate@4096x cell via the engine-side digest, co-resident,
with a DuckDB memory ceiling so the r11 OOM-kill mode becomes either
a completed (spilled) run or a cleanly captured refusal.

Runs OUTSIDE tools/floorfree.py --values-only because x13 carries
DIVERGENCE_CAPS[x13]=1024 (the r11 co-resident OOM); this script IS
the protocol that cap points at, with the ceiling applied.
"""
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from data_warehouse_spark.queries.registry import load_all  # noqa: E402
from data_warehouse_spark.session import get_spark  # noqa: E402
from tools.floorfree import digest_compare  # noqa: E402
from tools.parity import duck_connection  # noqa: E402

AMP = "/tmp/floorfree/ddbe1476_amp4096"
spec = load_all()["x13_decontaminate"]
spark = get_spark("x13digest")
con = duck_connection(AMP, pattern="{dir}/{t}.parquet/*.parquet",
                      skip_missing=True)
con.sql("SET memory_limit='58GB'")
con.sql("SET temp_directory='/tmp/duck_spill'")
ff = json.loads((REPO / "FLOORFREE.json").read_text())
cell = ff["floorfree"]["x13_decontaminate"]["4096"]
t0 = time.time()
try:
    ok, msg, s_n, d_n = digest_compare(spec.fn(spark, AMP), con,
                                       spec.oracle)
    cell["values_match"] = bool(ok)
    cell["values_note"] = (msg + " — digest run co-resident under a "
                          "58GB DuckDB memory ceiling (r13; the r11 "
                          "unceilinged co-resident run was OOM-killed)")
    print("RESULT", ok, msg, s_n, d_n, f"{time.time()-t0:.0f}s")
except (duckdb.OutOfMemoryException, duckdb.IOException, OSError,
        MemoryError) as e:
    m = " ".join(str(e).split())[:300]
    low = m.lower()
    markers = ("no space", "enospc", "disk full", "out of memory",
               "could not allocate", "cannot allocate",
               "failed to allocate")
    if isinstance(e, (duckdb.IOException, OSError)) and \
            not any(t in low for t in markers):
        raise
    cell["values_match"] = "skipped"
    cell["values_note"] = (
        f"digest attempted co-resident under a 58GB ceiling (r13): "
        f"oracle refused after {time.time()-t0:.0f}s with "
        f"{type(e).__name__}: {m}; row counts compared (r11 "
        "standalone protocol: 19,926,486 = spark rows)")
    print("REFUSED", type(e).__name__, m)
(REPO / "FLOORFREE.json").write_text(json.dumps(ff, indent=2) + "\n")
