import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as em
from tests.oracle_check import compare_one, duck_connection
from cdc_cloudrun_demo_spark.session import get_spark

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
spark = get_spark(app_name="parity", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
con = duck_connection(sf)
Q, O = em.queries(), em.oracle_sql()
names = only or sorted(O)
fails = 0
for name in names:
    t0 = time.time()
    if name not in O:  # rows-only op (no oracle): run + count, like the driver
        try:
            n = Q[name](spark, sf).count()
            print(f"OK† {name:28s} {time.time()-t0:5.1f}s rows={n} (rows-only)")
        except Exception as e:
            print(f"FAIL {name:27s} {time.time()-t0:5.1f}s {e}")
            fails += 1
        continue
    r = compare_one(spark, con, name, Q[name], O[name], sf)
    dt = time.time() - t0
    status = "OK  " if r.ok else "FAIL"
    print(f"{status} {name:28s} {dt:5.1f}s rows={r.spark_rows}/{r.oracle_rows} {r.detail[:300]}")
    if not r.ok:
        fails += 1
print(f"\n{len(names)-fails}/{len(names)} passed")
spark.stop()
