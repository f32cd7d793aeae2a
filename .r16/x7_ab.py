"""Interleaved A/B: x7 tf via explode+groupBy vs doc-local Arrow kernel."""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from data_warehouse_spark.io import load_table, spread_for_compute  # noqa: E402
from data_warehouse_spark.session import get_spark  # noqa: E402


def _doc_term_counts(docs, text_col, id_col):
    """The doc-local Arrow tf kernel that was MEASURED AND REJECTED
    for x7 (this script's result: 1.70 vs 1.14 s — shipping every
    distinct (doc, term) string back across the Arrow boundary loses
    to the never-leaves-the-JVM explode form). Kept here so the
    rejection stays reproducible."""
    id_type = dict(docs.dtypes)[id_col]

    def run(batches):
        import re
        from collections import Counter

        import pyarrow as pa

        sep = re.compile(r"[ \t\n\x0b\f\r]+")
        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_id, out_term, out_tf = [], [], []
            for i, s in zip(ids, texts):
                if s is None:
                    continue
                counts = Counter(sep.split(s))
                out_id.extend([i] * len(counts))
                out_term.extend(counts.keys())
                out_tf.extend(counts.values())
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_id, batch.column(0).type),
                 pa.array(out_term, pa.string()),
                 pa.array(out_tf, pa.int64())],
                [id_col, "term", "tf"])

    src = spread_for_compute(docs.select(
        F.col(id_col), F.lower(F.trim(F.col(text_col))).alias("__txt")))
    return src.mapInArrow(
        run, schema=f"{id_col} {id_type}, term string, tf bigint")

spark = get_spark("x7ab")
SF = "/root/testdata/sf0.1"


def build(form: str):
    docs = load_table(spark, SF, "documents")
    if form == "old":
        toks = docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim(F.col("text"))),
                              r"\s+")).alias("term"))
        tf = (toks.groupBy("doc_id", "term")
              .agg(F.count(F.lit(1)).alias("tf"))
              .localCheckpoint(eager=False))
    else:
        tf = (_doc_term_counts(docs, "text", "doc_id")
              .localCheckpoint(eager=False))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
    return (tf.join(F.broadcast(dfreq), on="term").crossJoin(F.broadcast(n))
            .select("doc_id", "term", F.round(score, 6).alias("tfidf"))
            .orderBy(F.col("tfidf").desc(), "doc_id", "term").limit(100))


best = {}
for i in range(6):
    for form in ("old", "new"):
        t0 = time.time()
        build(form).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best[form] = min(best.get(form, dt), dt)
for k, v in best.items():
    print(f"BEST {k}: {v:.3f}s")
