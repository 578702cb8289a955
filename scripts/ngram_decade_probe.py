"""Stage-localization probes for dedup_ngram_jaccard's fourth-decade
term (the round-14 PERF WATCH item; companion to ngram_census.py).

If the co-occurrence census reads ~linear (the replica scheme is
vocabulary-disjoint, so Sigma_s C(f,2) grows EXACTLY with replicas),
the 17-18x matched-layout decade ratio cannot be candidate growth --
the remaining suspects are per-task terms in the exchange-free plan,
whose parallelism IS the bucket count (32): the partial hash aggregate
over ~38M join rows per task falling back to sort-based spill, and
the per-task sorted-bucket scan.  Two probes split the hypothesis
space, bakeoff protocol (fresh JVM per cell, untimed cold that pays
the b_post write, then median-of-3):

  * HEAP probe (SPARK_GRAFT_BENCH_MEM=64g, buckets unchanged): if the
    term collapses with heap it is memory-pressure/spill-shaped at
    24 g, not algorithmic (the r13 arrayverify probe method).
  * BUCKET probe (256 buckets at 24 g): if the term collapses when
    per-task volume drops 8x at constant total work, the fix is
    corpus-scaled bucket sizing -- exactly what a production write
    does (size buckets to the data, not to a constant).

Usage:
    python scripts/ngram_decade_probe.py <sf_dir> <mem> <n_buckets>  # one cell
    python scripts/ngram_decade_probe.py                             # matrix
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF10 = "/tmp/spark-graft-sf10"
SF100 = "/tmp/spark-graft-sf100"

# (sf_dir, driver mem, b_post bucket count)
MATRIX = [
    (SF10, "24g", 32),     # same-day baseline, registered shape
    (SF100, "24g", 32),    # same-day baseline, registered shape
    (SF100, "64g", 32),    # heap probe
    (SF100, "24g", 256),   # bucket probe
    (SF10, "24g", 256),    # bucket-count sf10 control (ratio base)
]


def _measure(sf_dir: str, mem: str, n_buckets: int) -> dict:
    import gc

    from bench import _clear_stat_caches
    from operating_system_map_reduce_spark.operators import dedup as _dd
    from operating_system_map_reduce_spark.plans import pipeline
    from operating_system_map_reduce_spark.session import get_spark

    if n_buckets != 32:
        from operating_system_map_reduce_spark.plans.analytics import (
            at_rest_table)

        def patched(spark, sf_dir):
            return at_rest_table(
                spark, sf_dir, f"b_pp{n_buckets}", "s",
                lambda: _dd.shingle_postings(
                    pipeline._t(spark, sf_dir, "documents")),
                n_buckets=n_buckets)

        pipeline.bucketed_postings = patched

    spark = get_spark(app_name=f"ngram-probe-{os.path.basename(sf_dir)}",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": mem})
    fn = pipeline.dedup_ngram_jaccard
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    cold = round(time.perf_counter() - t0, 3)
    runs = []
    for _ in range(3):
        gc.collect()
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        _clear_stat_caches()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    return {"sf_dir": sf_dir, "mem": mem, "n_buckets": n_buckets,
            "cold": cold, "median": sorted(runs)[1], "runs": runs,
            "loadavg": round(os.getloadavg()[0], 1)}


def main() -> None:
    if len(sys.argv) == 4:
        print("MEASURE " + json.dumps(
            _measure(sys.argv[1], sys.argv[2], int(sys.argv[3]))))
        return
    for sf_dir, mem, n_buckets in MATRIX:
        if not os.path.isdir(sf_dir):
            print(f"SKIP {sf_dir} (missing)")
            continue
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir, mem,
             str(n_buckets)],
            capture_output=True, text=True, cwd=REPO, timeout=5400)
        lines = [ln for ln in out.stdout.splitlines()
                 if ln.startswith("MEASURE ")]
        if not lines:
            print(f"FAILED {sf_dir} {mem} b{n_buckets}\n"
                  f"{out.stdout[-1500:]}\n{out.stderr[-1500:]}")
            continue
        print(lines[-1][len("MEASURE "):], flush=True)


if __name__ == "__main__":
    main()
