"""e1@4096x core-scaling sweep (round-13, VERDICT r12 ask #7) — the
dq1b protocol applied to e1: run the registered e1_trips query at the
4096x-amplified events fixture on local[8/16/32], and the DuckDB
oracle at threads=8/16/32. If BOTH engines scale near-linearly, e1's
2.67x @4096x weak badge is confirmed per-core-kernel throughput (the
dq1b adjudication, now measured rather than analogized); a Spark
plateau would instead indicate an ownable cost.

Usage: python .r13/e1_cores.py spark <n_threads>
       python .r13/e1_cores.py duck <n_threads>
(one engine per process: Spark master is fixed per JVM, and the two
must never be timed concurrently.)
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

AMP = "/tmp/floorfree/ddbe1476_amp4096"
engine, n = sys.argv[1], int(sys.argv[2])

if engine == "spark":
    from data_warehouse_spark.queries.registry import load_all
    from data_warehouse_spark.session import get_spark
    spark = get_spark("e1cores", master=f"local[{n}]")
    fn = load_all()["e1_trips"].fn
    fn(spark, AMP).write.format("noop").mode("overwrite").save()  # warm
    best = None
    for _ in range(2):
        t0 = time.time()
        fn(spark, AMP).write.format("noop").mode("overwrite").save()
        best = min(best or 1e9, time.time() - t0)
    print(f"RESULT engine=spark threads={n} best_s={best:.2f}")
else:
    import duckdb  # noqa: F401

    from data_warehouse_spark.queries.registry import load_all
    from tools.parity import duck_connection
    spec = load_all()["e1_trips"]
    con = duck_connection(AMP, pattern="{dir}/{t}.parquet/*.parquet",
                          skip_missing=True)
    con.sql(f"SET threads={n}")
    con.execute(spec.oracle).fetchone()  # warm (LIMIT-free: full exec)
    best = None
    for _ in range(2):
        t0 = time.time()
        con.execute(spec.oracle).df()
        best = min(best or 1e9, time.time() - t0)
    print(f"RESULT engine=duck threads={n} best_s={best:.2f}")
