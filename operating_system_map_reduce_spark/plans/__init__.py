"""Query library exposed through __spark_entry__.

Each sub-module exports:
    QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
    ORACLES: dict[str, str]        -- ANSI SQL for DuckDB parity checks

Column names are aliased identically on both sides: the driver's
correctness compare sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def collect_registry() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    from operating_system_map_reduce_spark.plans import (
        analytics, curation, kvqueries, mining, pipeline, streamqueries, textprep,
    )

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in (analytics, kvqueries, pipeline, curation, streamqueries, textprep,
                mining):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)

    # Rotation policy: the driver's correctness gate checks the FIRST 50
    # entries in insertion order; the registry holds more.  Window
    # selection each round, in priority order:
    #   1. queries that have NEVER had a driver correctness row
    #      (new additions) take the front of the window;
    #   2. remaining slots refresh OLDEST-newest-row-first, so no
    #      registered query's newest green driver row falls more than two
    #      rounds behind HEAD (round-3 incident: local-green and
    #      driver-green can diverge after refactors).
    # Entries outside the window stay registered and stay covered by
    # tests/test_oracle_parity.py, which runs ALL entries against the
    # DuckDB oracle locally.
    #
    # Round 6: the seven new (never-checked) queries lead, then pure
    # staleness refresh: the nine r3-newest-row queries (two rounds
    # stale), then 34 of the 42 r4-newest-row queries.  Deferred to
    # round 7 (plans unchanged since r4, each with coverage beyond the
    # local oracle): `split_assign`, `sample_stratified`,
    # `sketch_distinct_tokens`, `contamination_check`
    # (test_curation.py differentials), `mr_odd_key_vals` (KMR
    # byte-parity goldens in test_mapreduce.py), `kv_aes_at_rest`
    # (crypto roundtrip in test_kv_engine.py),
    # `pipeline_corpus_curation` (a composition of stages each oracled
    # individually in-window or recently), `similarity_ivf_knn`
    # (superseded in-window by ivf_search/ivfpq_search; recall pins in
    # test_mining_ops.py).  The 50 r5-green entries rotate out for one
    # round.
    window = [
        # -- new in round 6 (never driver-checked) --------------------
        "bpe_merge_pairs",
        "nation_rolling_revenue",
        "stream_click_purchase_join",
        "supplier_brand_division",
        "orders_above_customer_avg",
        "doc_chunk_windows",
        "orders_grouping_sets",
        # -- r3-stale (newest driver row: round 3) --------------------
        "orders_rollup",
        "customer_order_coverage",
        "q4_order_priority",
        "inactive_customers_by_nation",
        "brand_supplier_breadth",
        "repeat_buyer_setops",
        "skew_salted_distinct",
        "all_users_fold",
        "multimodal_resize",
        # -- r4-aged (newest driver row: round 4) ---------------------
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_region_revenue",
        "top_customers_window",
        "events_sessionize",
        "events_json_extract",
        "asof_click_attribution",
        "range_join_prior_activity",
        "kv_get_point",
        "kv_all_keys",
        "kv_insert_guarded",
        "kv_upsert_classify",
        "changelog_replay",
        "kv_top_mru",
        "quota_sliding_window",
        "auth_hash_users",
        "dedup_exact",
        "text_quality",
        "token_count",
        "text_lang_id",
        "doc_fingerprint",
        "text_repetition",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "similarity_cosine_topk",
        "similarity_lsh_buckets",
        "multimodal_metadata",
        "similarity_lsh_knn",
        "dedup_embedding_cosine",
        "fn_registry_doc_stats",
        "multimodal_frame_sample",
        "multimodal_features",
        "text_tfidf_top_terms",
    ]
    ordered = {n: queries[n] for n in window}
    ordered.update({n: queries[n] for n in queries if n not in ordered})
    return ordered, oracles

