"""Plan-shape probe for the x2 verify optimizations (round 16).

1. Does the banding self-join reuse one exchange for both sides
   (ReusedExchange), or recompute the signature subtree twice?
2. What does the verify stage look like with (a) broadcast cand_ids
   semi-join and (b) a single checkpointed docsh subtree?

Plan-only: no timing, safe to run while other work shares the box.
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from data_warehouse_spark.io import load_table  # noqa: E402
from data_warehouse_spark.operators.dedup import (  # noqa: E402
    minhash_signatures,
)
from data_warehouse_spark.session import get_spark  # noqa: E402

spark = get_spark("x2shape")
docs = load_table(spark, "/root/testdata/sf0.01", "documents") \
    .select("doc_id", "text")

num_hashes, bands = 32, 8
rows_per_band = num_hashes // bands
sigs = minhash_signatures(docs, "text", "doc_id", num_hashes, 3)
banded = sigs.select(
    "doc_id",
    F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(*[F.element_at("signature", b * rows_per_band + r + 1)
                              for r in range(rows_per_band)]).alias("bucket"))
        for b in range(bands)
    ])).alias("bb"),
).select("doc_id", "bb.band", "bb.bucket")

left = banded.withColumnRenamed("doc_id", "id_a")
right = banded.withColumnRenamed("doc_id", "id_b")
candidates = (left.join(right, on=["band", "bucket"])
              .filter(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b")
              .distinct())

print("=== candidates plan (no checkpoint) ===")
plan = candidates._sc._jvm.PythonSQLUtils.explainString(
    candidates._jdf.queryExecution(), "formatted")
# print only the tree part
print(plan.split("\n\n")[0])
n_reused = plan.count("ReusedExchange")
n_exch = plan.count("Exchange")
print(f"ReusedExchange count: {n_reused}; Exchange mentions: {n_exch}")

# runtime: execute and print the FINAL adaptive plan (shows reuse)
candidates.write.format("noop").mode("overwrite").save()
final = candidates._sc._jvm.PythonSQLUtils.explainString(
    candidates._jdf.queryExecution(), "formatted")
print("=== final adaptive plan ===")
print(final.split("\n\n")[0])
print("ReusedExchange:", final.count("ReusedExchange"),
      " ReusedQueryStage:", final.count("ReusedQueryStage"))
