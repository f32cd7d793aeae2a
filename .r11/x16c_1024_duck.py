import sys, time, threading, os, shutil
sys.path.insert(0, '/root/repo')
from data_warehouse_spark.queries.registry import load_all
# load registry without spark: load_all imports query modules only
specs = load_all()
sql = specs["x16c_span_dedup_sparse"].oracle
from tools.parity import duck_connection
amp = "/tmp/floorfree/ddbe1476_amp1024"
con = duck_connection(amp, pattern="{dir}/{t}.parquet/*.parquet", skip_missing=True)
stop = False
peak = [0]; min_free=[10**12]
def watch():
    import resource
    while not stop:
        try:
            with open('/proc/self/status') as fh:
                for ln in fh:
                    if ln.startswith('VmRSS'):
                        peak[0] = max(peak[0], int(ln.split()[1]))
        except Exception: pass
        min_free[0] = min(min_free[0], shutil.disk_usage('/tmp').free)
        time.sleep(5)
threading.Thread(target=watch, daemon=True).start()
t0 = time.time()
try:
    rows = con.execute(sql).fetchall()
    dt = time.time() - t0
    print(f"RESULT duckdb_s={dt:.1f} rows={len(rows)} peak_rss_gb={peak[0]/2**20:.1f} min_free_gb={min_free[0]/2**30:.1f}")
except Exception as e:
    dt = time.time() - t0
    print(f"REFUSAL type={type(e).__name__} after={dt:.1f}s peak_rss_gb={peak[0]/2**20:.1f} min_free_gb={min_free[0]/2**30:.1f} msg={' '.join(str(e).split())[:400]}")
