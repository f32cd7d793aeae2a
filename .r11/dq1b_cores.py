import sys, time
sys.path.insert(0, '/root/repo')
from data_warehouse_spark.session import get_spark
from data_warehouse_spark.queries.registry import load_all

spark = get_spark("dq1bcores")
print("master:", spark.sparkContext.master)
specs = load_all()
amp = "/tmp/floorfree/ddbe1476_amp4096"
fn = specs["dq1b_validation_sketch"].fn
fn(spark, amp).write.format("noop").mode("overwrite").save()  # warm
best = None
for _ in range(2):
    t0 = time.time()
    fn(spark, amp).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    best = min(best or dt, dt)
print(f"RESULT master={spark.sparkContext.master} best_s={best:.2f}")
