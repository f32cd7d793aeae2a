"""Single-query best-of-N timer (noop sink, warm-up pass at sf0.001),
mirroring bench.py methodology for A/B work inside the round.

Usage: python .r16/time_query.py QUERY [N] [SF_DIR]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from data_warehouse_spark.queries.registry import load_all  # noqa: E402
from data_warehouse_spark.session import (  # noqa: E402
    ARROW_BATCH_DEFAULT, get_spark, set_arrow_batch,
)

name = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

spark = get_spark("time_query")
spec = load_all()[name]
try:
    spec.fn(spark, "/root/testdata/sf0.001") \
        .write.format("noop").mode("overwrite").save()
except Exception as e:  # noqa: BLE001
    print("warmup failed:", e)

best = None
for i in range(n):
    set_arrow_batch(spark, ARROW_BATCH_DEFAULT)
    t0 = time.time()
    df = spec.fn(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
    print(f"pass {i}: {dt:.3f}s")
print(f"BEST {name}: {best:.3f}s")
