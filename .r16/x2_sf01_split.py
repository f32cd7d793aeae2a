"""x2 stage split at sf0.1 against the CURRENT tree (r16 opt round).
Cumulative prefixes: sigs -> banded -> cand -> full. Best-of-3 each,
one shared session (bench methodology).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from data_warehouse_spark.io import load_table  # noqa: E402
from data_warehouse_spark.operators import dedup  # noqa: E402
from data_warehouse_spark.session import get_spark  # noqa: E402

spark = get_spark("x2split")
SF = "/root/testdata/sf0.1"


def docs():
    return load_table(spark, SF, "documents").select("doc_id", "text")


def build(variant: str):
    d = dedup.spread_for_compute(docs())
    sigs = dedup.minhash_signatures(d, "text", "doc_id", 32, 3)
    if variant == "sigs":
        return sigs
    rows_per_band = 4
    banded = sigs.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(*[F.element_at("signature", b * 4 + r + 1)
                                  for r in range(4)]).alias("bucket"))
            for b in range(8)
        ])).alias("bb")).select("doc_id", "bb.band", "bb.bucket")
    if variant == "banded":
        return banded
    left = banded.withColumnRenamed("doc_id", "id_a")
    right = banded.withColumnRenamed("doc_id", "id_b")
    cand = (left.join(right, on=["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    if variant == "cand":
        return cand
    return dedup.minhash_lsh_pairs(docs(), "text", "doc_id")


for variant in ("sigs", "banded", "cand", "full"):
    best = None
    for i in range(3):
        t0 = time.time()
        build(variant).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{variant:7s} best {best:.3f}s")
