"""o2_topk / x3_cosine_topk @1024x core-scaling sweep (round-14,
VERDICT r13 ask #6) — the e1/dq1b protocol applied to the two
remaining unattributed weak-set cells: run the registered query at the
1024x-amplified fixtures on local[8/16/32], and the DuckDB oracle at
threads=8/16/32. If BOTH engines scale near-linearly, the >2x badge is
per-core-kernel throughput (TakeOrderedAndProject heap-merge vs
DuckDB's top-N; scan+score+topk vs vectorized list arithmetic); a
Spark plateau would instead indicate an ownable cost.

Usage: python .r14/o2x3_cores.py spark <query> <n_threads>
       python .r14/o2x3_cores.py duck  <query> <n_threads>
(one engine per process: Spark master is fixed per JVM, and the two
must never be timed concurrently.)
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

AMP = "/tmp/floorfree/ddbe1476_amp1024"
engine, query, n = sys.argv[1], sys.argv[2], int(sys.argv[3])

if engine == "spark":
    from data_warehouse_spark.queries.registry import load_all
    from data_warehouse_spark.session import (
        ARROW_BATCH_DEFAULT, get_spark, set_arrow_batch,
    )
    spark = get_spark("o2x3cores", master=f"local[{n}]")
    fn = load_all()[query].fn
    set_arrow_batch(spark, ARROW_BATCH_DEFAULT)
    fn(spark, AMP).write.format("noop").mode("overwrite").save()  # warm
    best = None
    for _ in range(2):
        set_arrow_batch(spark, ARROW_BATCH_DEFAULT)
        t0 = time.time()
        fn(spark, AMP).write.format("noop").mode("overwrite").save()
        best = min(best or 1e9, time.time() - t0)
    print(f"RESULT engine=spark query={query} threads={n} "
          f"best_s={best:.3f}")
else:
    from data_warehouse_spark.queries.registry import load_all
    from tools.parity import duck_connection
    spec = load_all()[query]
    con = duck_connection(AMP, pattern="{dir}/{t}.parquet/*.parquet",
                          skip_missing=True)
    con.sql(f"SET threads={n}")
    con.execute(spec.oracle).fetchone()  # warm (full exec)
    best = None
    for _ in range(2):
        t0 = time.time()
        con.execute(spec.oracle).df()
        best = min(best or 1e9, time.time() - t0)
    print(f"RESULT engine=duck query={query} threads={n} "
          f"best_s={best:.3f}")
