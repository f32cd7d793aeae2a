"""mm4_feature_ann @1024x decomposition (round-15, VERDICT r14 ask #4)
— split the 4.77x floor-free top cell into its physical components:

  scan   : parquet scan of documents (doc_id, text), noop write
  math   : octet_length(text) features + cosine + top-k (NO binary
           payload attach — the pipeline minus the multimodal part)
  full   : the registered mm4 plan (attach_blob's F.encode payload +
           octet_length(blob) features + top-k)
  cast   : mm4 with the payload attached via CAST(text AS BINARY)
           (Spark strings are UTF-8 bytes internally, so the cast is
           the zero-copy form of the same payload) — the candidate fix
  duck   : the DuckDB oracle (strlen(text) — it never materializes a
           payload at all)

Usage: python .r15/mm4_decomp.py spark <variant> <threads>
       python .r15/mm4_decomp.py duck - <threads>
(one engine per process; never timed concurrently.)
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

AMP = "/tmp/floorfree/ddbe1476_amp1024"
engine, variant, n = sys.argv[1], sys.argv[2], int(sys.argv[3])

if engine == "spark":
    from pyspark.sql import functions as F

    from data_warehouse_spark.io import load_table
    from data_warehouse_spark.session import get_spark

    spark = get_spark("mm4decomp", master=f"local[{n}]")

    def plan():
        docs = load_table(spark, AMP, "documents")
        if variant == "scan":
            return docs.select("doc_id", "text")
        if variant == "math":
            base = docs.select(
                "doc_id",
                F.coalesce(F.octet_length("text"), F.lit(0)).alias("__n"))
        elif variant == "full":
            from data_warehouse_spark.queries.registry import load_all
            return load_all()["mm4_feature_ann"].fn(spark, AMP)
        elif variant == "cast":
            blob = F.col("text").cast("binary")
            base = docs.select(
                "doc_id",
                F.coalesce(F.octet_length(blob), F.lit(0)).alias("__n"))
        else:
            raise SystemExit(f"unknown variant {variant}")
        nn = F.col("__n")
        f0, f1, f2 = [(nn % k).cast("double") for k in (7, 11, 13)]
        sumsq = f0 * f0 + f1 * f1 + f2 * f2
        sim = (f0 * 1.0 + f1 * 2.0 + f2 * 3.0) \
            / (F.sqrt(sumsq) * F.sqrt(F.lit(14.0)))
        return (base.select("doc_id", sim.alias("__s"), sumsq.alias("__ss"))
                .filter(F.col("__ss") > 0)
                .select("doc_id", F.round("__s", 6).alias("cos_sim"))
                .orderBy(F.col("cos_sim").desc(), "doc_id").limit(20))

    plan().write.format("noop").mode("overwrite").save()  # warm
    best = None
    for _ in range(3):
        t0 = time.time()
        plan().write.format("noop").mode("overwrite").save()
        best = min(best or 1e9, time.time() - t0)
    print(f"RESULT engine=spark variant={variant} threads={n} "
          f"best_s={best:.3f}")
else:
    from data_warehouse_spark.queries.registry import load_all
    from tools.parity import duck_connection

    spec = load_all()["mm4_feature_ann"]
    con = duck_connection(AMP, pattern="{dir}/{t}.parquet/*.parquet",
                          skip_missing=True)
    con.sql(f"SET threads={n}")
    con.execute(spec.oracle).fetchone()  # warm
    best = None
    for _ in range(3):
        t0 = time.time()
        con.execute(spec.oracle).df()
        best = min(best or 1e9, time.time() - t0)
    print(f"RESULT engine=duck threads={n} best_s={best:.3f}")
