"""Amplified interleaved A/B for the Arrow signature kernel: full x2
(registered shape) at a .r16/x2_decomp.py amplified corpus, expr vs
arrow signature impl, same session, best-of-N per variant.

Usage: python .r16/x2_amp_ab.py <mult> [passes]
(requires `python .r16/x2_decomp.py build <mult>` artifacts)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from data_warehouse_spark.io import load_table  # noqa: E402
from data_warehouse_spark.operators import dedup  # noqa: E402
from data_warehouse_spark.session import get_spark  # noqa: E402

mult = int(sys.argv[1])
passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4
AMP = f"/tmp/x2amp/amp{mult}"

spark = get_spark("x2ampab")
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
        docs = load_table(spark, AMP, "documents")
        df = dedup.minhash_lsh_pairs(docs, text_col="text",
                                     id_col="doc_id", num_hashes=32,
                                     bands=8, jaccard_threshold=0.5)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0
    finally:
        dedup.minhash_signatures = orig


best = {}
for i in range(passes):
    for impl in ("expr", "auto"):
        dt = run(impl)
        best[impl] = min(best.get(impl, dt), dt)
        print(f"pass {i} {impl}: {dt:.2f}s", flush=True)
for k, v in best.items():
    print(f"BEST {k} @ {mult}x: {v:.2f}s")
