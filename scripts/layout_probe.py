#!/usr/bin/env python
"""The round-14 at-rest layout A/B (SCALING.md round-14 second leg):
build the postings table in both layouts — per-task bucket files
(the pre-r14 write) vs one file per bucket (repartition-on-write) —
and measure build wall, file count, and the ngram pair derivation
over each (median-of-3 after an untimed warm-up, interleaved twice).

Usage: python scripts/layout_probe.py <sf_dir>
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
    from operating_system_map_reduce_spark.operators import dedup as dd
    from operating_system_map_reduce_spark.plans.pipeline import (
        _ngram_pair_rows)
    from operating_system_map_reduce_spark.session import get_spark
    from operating_system_map_reduce_spark.sources.tables import load_table

    spark = get_spark(app_name="layout-probe",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    docs = load_table(spark, sys.argv[1], "documents").select("doc_id", "text")

    def build(table: str, one_file: bool) -> None:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(os.path.join(wh, table), ignore_errors=True)
        df = dd.shingle_postings(docs)
        if one_file:
            df = df.repartition(32, F.col("s"))
        t0 = time.perf_counter()
        (df.write.format("parquet").mode("overwrite")
         .bucketBy(32, "s").sortBy("s").saveAsTable(table))
        dt = round(time.perf_counter() - t0, 3)
        nf = len([f for f in os.listdir(os.path.join(wh, table))
                  if f.endswith(".parquet")])
        print(f"build {table} one_file={one_file}: {dt}s files={nf}")

    def med3(table: str, label: str) -> None:
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

    build("b_lay_multi", False)
    build("b_lay_single", True)
    # interleaved twice so a load drift cannot masquerade as the delta
    med3("b_lay_multi", "multi-file layout")
    med3("b_lay_single", "single-file layout")
    med3("b_lay_multi", "multi-file layout (2nd)")
    med3("b_lay_single", "single-file layout (2nd)")
    for t in ("b_lay_multi", "b_lay_single"):
        spark.sql(f"DROP TABLE {t}")
    spark.stop()


if __name__ == "__main__":
    main()
