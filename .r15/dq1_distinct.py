"""dq1_validation_report exact-distinct strategies @1024x/4096x
(round-15, VERDICT r14 ask #6) — measure whether any rewrite of the
uniqueness branch beats the shipped "grouped" strategy:

  grouped : the registered plan — separate groupBy(event_id) branch,
            sum(cnt-1), pruned to the key column (shuffles ~n keys)
  inline  : count(*) - countDistinct(struct(key)) inside the one
            aggregate (Spark plans it via Expand: every input row
            duplicated 2x through the first aggregate)
  twolevel: the verdict's suggested manual pre-dedup — distinct() on
            the key column, then count, joined into the report
            (pre-aggregate on key then count)
  duck    : the DuckDB oracle (exact COUNT(DISTINCT) in RAM)

Usage: python .r15/dq1_distinct.py spark <variant> <mult>
       python .r15/dq1_distinct.py duck - <mult>
(one engine per process; never timed concurrently.)
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

engine, variant, mult = sys.argv[1], sys.argv[2], sys.argv[3]
AMP = f"/tmp/floorfree/ddbe1476_amp{mult}"

if engine == "spark":
    from pyspark.sql import functions as F

    from data_warehouse_spark.operators.validation import (
        validation_report,
    )
    from data_warehouse_spark.queries.warehouse import (
        _dq_corrupted_log, _dq_rules,
    )
    from data_warehouse_spark.session import get_spark

    spark = get_spark("dq1lane", master="local[32]")

    def plan():
        log = _dq_corrupted_log(spark, AMP)
        if variant in ("grouped", "inline"):
            return validation_report(log, rules=_dq_rules(),
                                     unique_key=["event_id"],
                                     uniqueness=variant)
        if variant == "twolevel":
            # manual pre-dedup: distinct on the pruned key column,
            # then a 1-row count joined into the report
            wide = validation_report(log, rules=_dq_rules())
            nd = (log.select("event_id").distinct()
                  .agg(F.count(F.lit(1)).alias("__nd")))
            n = log.agg(F.count(F.lit(1)).alias("__n2"))
            uniq = (n.crossJoin(nd)
                    .select(F.lit("event_id_unique").alias("rule"),
                            (F.col("__n2") - F.col("__nd"))
                            .cast("long").alias("n_violations"),
                            F.col("__n2").alias("n_rows")))
            return wide.unionByName(uniq)
        raise SystemExit(f"unknown variant {variant}")

    plan().write.format("noop").mode("overwrite").save()  # warm
    best = None
    for _ in range(3):
        t0 = time.time()
        plan().write.format("noop").mode("overwrite").save()
        best = min(best or 1e9, time.time() - t0)
    print(f"RESULT engine=spark variant={variant} mult={mult} "
          f"best_s={best:.3f}")
else:
    from data_warehouse_spark.queries.registry import load_all
    from tools.parity import duck_connection

    spec = load_all()["dq1_validation_report"]
    con = duck_connection(AMP, pattern="{dir}/{t}.parquet/*.parquet",
                          skip_missing=True)
    con.sql("SET threads=32")
    con.execute(spec.oracle).fetchone()  # warm
    best = None
    for _ in range(3):
        t0 = time.time()
        con.execute(spec.oracle).df()
        best = min(best or 1e9, time.time() - t0)
    print(f"RESULT engine=duck mult={mult} best_s={best:.3f}")
