#!/usr/bin/env python
"""Read-side cost of append fragmentation (SCALING.md round-14): the
ngram pair derivation over the SAME rows in (a) an append-fragmented
layout (seed one quarter + 3 delta appends, no compaction) vs (b) the
compacted one-file-per-bucket layout — plus the compaction wall that
converts (a) into (b).  Quantifies what NOT running the SAV-analog
compaction costs, i.e. the number that sets the compaction schedule.

Usage: python scripts/frag_probe.py <sf_dir>
"""

from __future__ import annotations

import gc
import os
import shutil
import sys
import time
from urllib.parse import urlparse

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from bench import _clear_stat_caches
    from operating_system_map_reduce_spark.plans.pipeline import (
        _ngram_pair_rows, postings_append, postings_seed)
    from operating_system_map_reduce_spark.session import get_spark
    from operating_system_map_reduce_spark.sources.bucketing import (
        compact_bucketed)
    from operating_system_map_reduce_spark.sources.tables import load_table

    sf = sys.argv[1]
    spark = get_spark(app_name="frag-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    table = "b_frag_probe"
    for t in (table, f"{table}_compacting"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    postings_seed(
        spark, docs.filter(F.pmod(F.col("doc_id"), F.lit(4)) == 0),
        table, 32)
    for k in (1, 2, 3):
        postings_append(
            spark, docs.filter(F.pmod(F.col("doc_id"), F.lit(4)) == k),
            table, 32)

    def med3(label: str) -> None:
        q = lambda: (_ngram_pair_rows(spark.table(table))
                     .write.format("noop").mode("overwrite").save())
        q()  # warm-up
        runs = []
        for _ in range(3):
            gc.collect()
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            _clear_stat_caches()
            t0 = time.perf_counter()
            q()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{label}: runs={runs} med={sorted(runs)[1]}")

    def nfiles() -> int:
        return len([f for f in os.listdir(os.path.join(wh, table))
                    if f.endswith(".parquet")])

    print("fragmented files:", nfiles())
    med3("fragmented (seed + 3 appends)")
    t0 = time.perf_counter()
    compact_bucketed(spark, table, "s", 32)
    print("compact_sec:", round(time.perf_counter() - t0, 3))
    print("compacted files:", nfiles())
    med3("compacted")
    spark.sql(f"DROP TABLE {table}")
    spark.stop()


if __name__ == "__main__":
    main()
