"""Interleaved A/B of x2 with expr vs arrow signature impl."""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from data_warehouse_spark.io import load_table  # noqa: E402
from data_warehouse_spark.operators import dedup  # noqa: E402
from data_warehouse_spark.session import get_spark  # noqa: E402

spark = get_spark("x2ab")
SF = "/root/testdata/sf0.1"

orig = dedup.minhash_signatures


def forced(impl):
    def f(df, text_col, id_col, num_hashes=32, shingle_n=3,
          hash_family="xxhash64", **kw):
        return orig(df, text_col, id_col, num_hashes, shingle_n,
                    hash_family, impl=impl)
    return f


def run(impl):
    dedup.minhash_signatures = forced(impl)
    try:
        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        df = dedup.minhash_lsh_pairs(docs, "text", "doc_id")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0
    finally:
        dedup.minhash_signatures = orig


best = {}
for i in range(5):
    for impl in ("expr", "auto"):
        dt = run(impl)
        best[impl] = min(best.get(impl, dt), dt)
        print(f"pass {i} {impl}: {dt:.3f}s")
for k, v in best.items():
    print(f"BEST {k}: {v:.3f}s")
