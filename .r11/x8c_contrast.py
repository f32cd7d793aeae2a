import sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from data_warehouse_spark.session import get_spark
from data_warehouse_spark.io import load_table
from data_warehouse_spark.operators.graph import (
    connected_components, connected_components_stars)
from data_warehouse_spark.queries.dedup_pipeline import _HD_CHAIN

spark = get_spark("x8ccontrast")
amp = "/tmp/floorfree/ddbe1476_amp16"
docs = load_table(spark, amp, "documents").select("doc_id")
a, b = docs.alias("a"), docs.alias("b")
edges = (a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
         .filter(F.floor(F.col("a.doc_id") / _HD_CHAIN)
                 == F.floor(F.col("b.doc_id") / _HD_CHAIN))
         .select(F.col("a.doc_id").alias("id_a"),
                 F.col("b.doc_id").alias("id_b")))

t0 = time.time()
n1 = connected_components_stars(edges, "id_a", "id_b").count()
t_stars = time.time() - t0
print(f"stars: {t_stars:.1f}s rows={n1}", flush=True)
t0 = time.time()
n2 = connected_components(edges, "id_a", "id_b", max_iters=300).count()
t_label = time.time() - t0
print(f"minlabel: {t_label:.1f}s rows={n2}", flush=True)
assert n1 == n2
