"""One-off: auto vs min-label vs stars on the CLIQUE regime (x8's
near-dup graph at sf0.1) — the SCALE.md ask-#4 note's missing half.
Pairs are materialized once to parquet so only the CC algorithms are
timed."""
import time, json
from data_warehouse_spark.session import get_spark  # type: ignore
from data_warehouse_spark.io import load_table
from data_warehouse_spark.operators.dedup import ngram_jaccard_pairs
from data_warehouse_spark.operators import graph as G

spark = get_spark("clique-auto")
docs = load_table(spark, "/root/testdata/sf0.1", "documents")
pairs = ngram_jaccard_pairs(docs, text_col="text", id_col="doc_id",
                            block_col="lang", n=2, threshold=0.1)
pdir = "/tmp/r12_clique_pairs"
pairs.write.mode("overwrite").parquet(pdir)
edges = spark.read.parquet(pdir)
print("edges:", edges.count())

out = {}
for name, fn in [
    ("min_label", lambda e: G.connected_components(e, "id_a", "id_b")),
    ("stars", lambda e: G.connected_components_stars(e, "id_a", "id_b")),
    ("auto", lambda e: G.connected_components_auto(e, "id_a", "id_b")),
]:
    best = None
    for _ in range(2):
        t0 = time.time()
        n = fn(edges).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    out[name] = {"s": round(best, 2), "rows": n}
    print(name, out[name], flush=True)
print("RESULT", json.dumps(out))
