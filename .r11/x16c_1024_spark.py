import sys, time, threading
sys.path.insert(0, '/root/repo')
from data_warehouse_spark.session import get_spark
from data_warehouse_spark.queries.registry import load_all

spark = get_spark("x16c1024")
specs = load_all()
amp = "/tmp/floorfree/ddbe1476_amp1024"

import shutil
stop = False
min_free = [10**12]
def watch():
    while not stop:
        f = shutil.disk_usage("/tmp").free
        min_free[0] = min(min_free[0], f)
        time.sleep(5)
t = threading.Thread(target=watch, daemon=True); t.start()

t0 = time.time()
df = specs["x16c_span_dedup_sparse"].fn(spark, amp)
df.write.format("noop").mode("overwrite").save()
dt = time.time() - t0
t0c = time.time()
n = specs["x16c_span_dedup_sparse"].fn(spark, amp).count()
dtc = time.time() - t0c
stop = True
print(f"RESULT spark_s={dt:.1f} count_s={dtc:.1f} rows={n} min_free_gb={min_free[0]/2**30:.1f}")
