"""Signature-stage micro-split at sf0.1: where do the 2.4s go?

v0: scan + lower/split/zip-shingle explode + count     (shingle build)
v1: v0 + xxhash64 per shingle                          (hashing)
v2: full minhash_signatures                            (32 mod-mul mins)
v3: like v2 but aggregate over UNHASHED... skipped
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from data_warehouse_spark.io import load_table, spread_for_compute  # noqa: E402
from data_warehouse_spark.operators.dedup import (  # noqa: E402
    minhash_signatures, shingles,
)
from data_warehouse_spark.session import get_spark  # noqa: E402

spark = get_spark("sigsplit")
SF = "/root/testdata/sf0.1"


def docs():
    return spread_for_compute(
        load_table(spark, SF, "documents").select("doc_id", "text"))


def build(v: str):
    if v == "v0":
        sh = docs().select("doc_id",
                           F.explode(shingles("text", 3)).alias("__s"))
        return sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    if v == "v1":
        sh = (docs().select("doc_id",
                            F.explode(shingles("text", 3)).alias("__s"))
              .select("doc_id",
                      F.xxhash64("__s").bitwiseAND(F.lit(0x7FFFFFFF))
                      .alias("__h")))
        return sh.groupBy("doc_id").agg(F.min("__h").alias("m"))
    return minhash_signatures(docs(), "text", "doc_id", 32, 3)


best: dict[str, float] = {}
for _ in range(6):
    for v in ("v0", "v1", "v2"):
        t0 = time.time()
        build(v).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best[v] = min(best.get(v, dt), dt)
for v, b in best.items():
    print(f"{v} best {b:.3f}s")

# v3: signatures with Mersenne shift-add reduction instead of % p
P = (1 << 31) - 1


def mersenne(v):
    r1 = v.bitwiseAND(F.lit(P)) + F.shiftright(v, 31)
    r2 = r1.bitwiseAND(F.lit(P)) + F.shiftright(r1, 31)
    return F.when(r2 == P, F.lit(0)).otherwise(r2)


def sigs_mersenne():
    from data_warehouse_spark.operators.dedup import _minhash_coeffs
    sh = (docs().select("doc_id",
                        F.explode(shingles("text", 3)).alias("__s"))
          .select("doc_id",
                  F.xxhash64("__s").bitwiseAND(F.lit(0x7FFFFFFF))
                  .alias("__h")))
    aggs = [F.min(mersenne(F.col("__h") * F.lit(a) + F.lit(b))).alias(f"h{i}")
            for i, (a, b) in enumerate(_minhash_coeffs(32))]
    return sh.groupBy("doc_id").agg(*aggs)


# exactness check vs the % form on the real corpus
from data_warehouse_spark.operators.dedup import _minhash_coeffs  # noqa: E402
sh = (docs().select("doc_id", F.explode(shingles("text", 3)).alias("__s"))
      .select("doc_id", F.xxhash64("__s").bitwiseAND(F.lit(0x7FFFFFFF))
              .alias("__h")))
a0, b0 = _minhash_coeffs(32)[0]
v = F.col("__h") * F.lit(a0) + F.lit(b0)
diff = sh.select((mersenne(v) - (v % F.lit(P))).alias("d")) \
    .filter(F.col("d") != 0).count()
print("mersenne mismatches:", diff)

best2: dict[str, float] = {}
for _ in range(6):
    for v2name, fn in (("v2_mod", lambda: build("v2")),
                       ("v3_mer", sigs_mersenne)):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best2[v2name] = min(best2.get(v2name, dt), dt)
for k, b in best2.items():
    print(f"{k} best {b:.3f}s")
