#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing = full plan execution to a count-collapsed action (foreach-noop
would skip result materialization; count() forces every operator).
Each query runs once warm-up-free except a single session-warming no-op.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "top_customers_window",
    "order_value_deciles",
    "events_sessionize",
    "changelog_replay",
    "quota_sliding_window",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_lsh_buckets",
    "similarity_lsh_knn",
    "similarity_ivf_knn",
    "dedup_embedding_cosine",
    "multimodal_metadata",
    "text_quality",
    "text_lang_id",
    "token_count",
    "doc_fingerprint",
    "asof_click_attribution",
    "range_join_prior_activity",
    "q4_order_priority",
    "brand_supplier_breadth",
    "repeat_buyer_setops",
    "fn_registry_doc_stats",
    "stream_windowed_counts",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from operating_system_map_reduce_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="osmr-bench", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # JVM/codegen warm-up on the smallest SF so measured times are engine
    # time, not first-query classloading.
    qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        total += dt

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
