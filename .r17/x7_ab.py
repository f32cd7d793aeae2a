"""x7_tfidf pin-strategy A/B at amplification (VERDICT r16 ask #5).

The tf subtree (explode -> groupBy(doc,term)) has two consumers (the
df-per-term aggregate and the final join spine); Catalyst's self-join
dedup re-aliases the second consumer, which defeats ReusedExchange, so
r14 pinned tf with localCheckpoint(eager=False). r16 re-measured the
checkpoint's removal at sf0.1 (slower: 1.64 vs 1.32) but the cells were
floor-bound; this script re-runs the comparison at 64x/256x where the
work dominates the floor, adding the persist variant the VERDICT asked
about:

  checkpoint — shipped form: tf.localCheckpoint(eager=False)
  persist    — tf.persist(MEMORY_AND_DISK), unpersisted after the run
               (keeps the logical plan + stats; InMemoryRelation)
  nopin      — plain tf reused by reference (tests whether Catalyst
               re-aliasing really defeats exchange reuse at scale:
               if ReusedExchange fired, this would be fastest)

Interleaved best-of-N, noop sink, fresh plan per run.
Usage: python .r17/x7_ab.py [MULT] [N]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from data_warehouse_spark.io import load_table
from data_warehouse_spark.session import get_spark
from tools.floorfree import build_amplified

MULT = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = get_spark("x7_ab")
spark.sparkContext.setLogLevel("ERROR")
amp = build_amplified(spark, "/root/testdata/sf0.1",
                      f"/tmp/r17_x7_{MULT}", MULT, tables=["documents"])


def tf_df():
    docs = load_table(spark, amp, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    return docs, tf


def finish(docs, tf):
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.col("tf") * F.log((F.col("n_docs") + 1.0)
                                / (F.col("df") + 1.0))
    (tf.join(F.broadcast(dfreq), on="term").crossJoin(F.broadcast(n))
     .select("doc_id", "term", F.round(score, 6).alias("tfidf"))
     .orderBy(F.col("tfidf").desc(), "doc_id", "term").limit(100)
     .write.format("noop").mode("overwrite").save())


def run_checkpoint():
    docs, tf = tf_df()
    finish(docs, tf.localCheckpoint(eager=False))


def run_persist():
    docs, tf = tf_df()
    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        finish(docs, tf)
    finally:
        tf.unpersist()


def run_nopin():
    docs, tf = tf_df()
    finish(docs, tf)


VARIANTS = [("checkpoint", run_checkpoint),
            ("persist", run_persist),
            ("nopin", run_nopin)]

best = {}
for name, fn in VARIANTS:  # warm
    fn()
for i in range(N):
    for name, fn in VARIANTS:
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best[name] = min(best.get(name, dt), dt)
print(f"MULT={MULT} best-of-{N}")
for name, _ in VARIANTS:
    print(f"  {name:12s} {best[name]:7.3f}s")
