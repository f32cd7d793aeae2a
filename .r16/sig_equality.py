"""Exact-equality check: Arrow minhash kernel vs expression form,
over every fixture corpus + an adversarial corpus (unicode, ASCII
control whitespace, empties, exact .5 boundaries don't exist — all
integer math). Zero tolerance: any differing row fails.
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from data_warehouse_spark.io import load_table  # noqa: E402
from data_warehouse_spark.operators.dedup import minhash_signatures  # noqa: E402
from data_warehouse_spark.session import get_spark  # noqa: E402

spark = get_spark("sigeq")

ADVERSARIAL = [
    (1, "plain ascii words here"),
    (2, "  leading and  trailing  "),
    (3, "tabs\tand\nnewlines\x0bvt\x0cff\rcr mixed"),
    (4, ""),
    (5, None),
    (6, "one two"),                      # < n tokens -> no row
    (7, "ünïcode wörds ärę kept Σπάρκ İstanbul"),
    (8, "nbsp is not a Java-\\s separator so these stay"),
    (9, "UPPER Case MiXeD lowering"),
    (10, "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 8),
    (11, "word " * 200),                 # long, duplicate shingles
    (12, "\t\t\t"),                      # only separators
    (13, "a  b   c"),                    # runs of separators
    (14, "ß SS groß GROSS"),
]


def compare(df, tag):
    a = minhash_signatures(df, "text", "doc_id", 32, 3, impl="expr")
    b = minhash_signatures(df, "text", "doc_id", 32, 3)  # auto -> arrow
    aa = {r.doc_id: r.signature for r in a.collect()}
    bb = {r.doc_id: r.signature for r in b.collect()}
    assert set(aa) == set(bb), (
        f"{tag}: row sets differ: {set(aa) ^ set(bb)}")
    bad = [k for k in aa if aa[k] != bb[k]]
    assert not bad, f"{tag}: {len(bad)} differing signatures, e.g. {bad[:3]}"
    print(f"{tag}: {len(aa)} docs identical")


adf = spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")
compare(adf, "adversarial")
for sf in ("sf0.001", "sf0.01", "sf0.1"):
    docs = load_table(spark, f"/root/testdata/{sf}", "documents") \
        .select("doc_id", "text")
    compare(docs, sf)
print("ALL EQUAL")
