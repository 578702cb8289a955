"""pagerank_neardup sf1 variance diagnosis (round-10 verdict #3).

Arms:
  A baseline      -- 6 timed runs, same method as sf1_spotrun._measure
  B gc-between    -- same, but System.gc() + py GC + clearCache between runs
Per run: wall, JVM GC-time delta, GC count delta, #cached RDD blocks,
storage memory used.
"""
import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from bench import _clear_stat_caches
from operating_system_map_reduce_spark.session import get_spark

SF1 = "/tmp/spark-graft-sf1"
ARM = sys.argv[1] if len(sys.argv) > 1 else "A"

spark = get_spark(app_name=f"pr-diag-{ARM}",
                  extra_conf={"spark.ui.enabled": "false",
                              "spark.driver.memory": "24g"})
qs = entry.queries()
fn = qs["pagerank_neardup"]
jvm = spark._jvm
sc = spark.sparkContext


def gc_stats():
    total_ms, count = 0, 0
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    it = beans.iterator()
    while it.hasNext():
        b = it.next()
        total_ms += b.getCollectionTime()
        count += b.getCollectionCount()
    return total_ms, count


def storage_state():
    # RDD storage info via the status store
    jsc = sc._jsc.sc()
    rdds = jsc.getRDDStorageInfo()
    n_blocks = sum(r.numCachedPartitions() for r in rdds)
    mem = sum(r.memSize() for r in rdds)
    disk = sum(r.diskSize() for r in rdds)
    return len(rdds), n_blocks, mem // (1 << 20), disk // (1 << 20)


# warm-up (untimed)
fn(spark, SF1).write.format("noop").mode("overwrite").save()

rows = []
for i in range(6):
    if ARM == "B":
        gc.collect()
        spark.catalog.clearCache()
        jvm.System.gc()
        time.sleep(1)
    _clear_stat_caches()
    g0, c0 = gc_stats()
    t0 = time.perf_counter()
    fn(spark, SF1).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    g1, c1 = gc_stats()
    rows.append({"run": i, "wall": round(wall, 2),
                 "gc_ms": g1 - g0, "gc_n": c1 - c0,
                 "storage": storage_state()})
    print("RUN", json.dumps(rows[-1]), flush=True)

print("DIAG " + json.dumps({"arm": ARM, "rows": rows}))
spark.stop()
