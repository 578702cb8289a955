#!/usr/bin/env python
"""Measured row for the incremental postings maintenance staging
(r14; the r13 verdict's "What's missing #4"): at a given SF, compare

  * full rebuild  -- postings_seed over the whole corpus (what the
                     mtime-invalidation path pays on ANY change);
  * delta append  -- postings_append of a 1% tail (what an ingest
                     tick pays under incremental maintenance);
  * compaction    -- compact_bucketed back to one file per bucket
                     (the periodic SAV-analog cost).

One fresh JVM, the bakeoff's hygiene (gc + clearCache between
phases).  Row-count equivalence of (seed 99% + append 1%) vs the full
rebuild is asserted inline -- the same check tests/test_r15_queue.py
pins at the fixture SF.

Usage: python scripts/incremental_bench.py <sf_dir> [delta_pct]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1]
    delta_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    from pyspark.sql import functions as F

    from operating_system_map_reduce_spark.plans.pipeline import (
        postings_append, postings_seed)
    from operating_system_map_reduce_spark.session import get_spark
    from operating_system_map_reduce_spark.sources.bucketing import (
        compact_bucketed)
    from operating_system_map_reduce_spark.sources.tables import load_table

    mem = os.environ.get("SPARK_GRAFT_BENCH_MEM", "24g")
    spark = get_spark(app_name="incremental-bench",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": mem})
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    is_delta = F.pmod(F.col("doc_id"), F.lit(100)) < F.lit(delta_pct)

    def hygiene():
        gc.collect()
        spark.catalog.clearCache()
        spark._jvm.System.gc()

    out: dict = {"sf_dir": sf_dir, "delta_pct": delta_pct}

    full, incr = "b_posti_full_bench", "b_posti_incr_bench"
    # a killed prior run leaves orphan DIRECTORIES the in-memory
    # catalog no longer knows about -- DROP TABLE alone cannot clear
    # them and saveAsTable then fails on the existing location
    import shutil
    from urllib.parse import urlparse
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in (full, incr):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {t}_compacting")
        for d in (t, f"{t}_compacting"):
            shutil.rmtree(os.path.join(wh, d), ignore_errors=True)

    t0 = time.perf_counter()
    postings_seed(spark, docs, full, n_buckets=32)
    out["full_rebuild_sec"] = round(time.perf_counter() - t0, 3)

    hygiene()
    t0 = time.perf_counter()
    postings_seed(spark, docs.filter(~is_delta), incr, n_buckets=32)
    out["seed_99_sec"] = round(time.perf_counter() - t0, 3)

    hygiene()
    t0 = time.perf_counter()
    postings_append(spark, docs.filter(is_delta), incr, n_buckets=32)
    out["delta_append_sec"] = round(time.perf_counter() - t0, 3)

    hygiene()
    t0 = time.perf_counter()
    compact_bucketed(spark, incr, "s", n_buckets=32)
    out["compact_sec"] = round(time.perf_counter() - t0, 3)

    n_full = spark.table(full).count()
    n_incr = spark.table(incr).count()
    assert n_full == n_incr, (n_full, n_incr)
    out["rows"] = n_full
    out["append_vs_rebuild"] = round(
        out["full_rebuild_sec"] / max(out["delta_append_sec"], 1e-9), 1)

    for t in (full, incr):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    print("MEASURE " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
