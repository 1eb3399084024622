"""Query registry: every implemented pipeline/operator exposed to the
driver contract (__ray_entry__.queries / oracle_sql).

The driver evaluates queries in registry order and caps at ~50 per round
(round 2 evidence: CORRECTNESS_r02.json held exactly the first 50 of 66).
`_PRIORITY` therefore pins the evaluation window: flagship extraction and
similarity pipelines first (they had zero driver-side evidence in r02),
then everything changed this round, then one representative per operator
family. Repeatedly-green redundant entries (green in both r01 and r02,
unchanged since) sit past the window — they remain fully registered and
pytest-gated, just lowest priority for driver evaluation.
"""

from __future__ import annotations

from .pipelines import (
    analytics,
    events,
    extraction_queries,
    relational,
    similarity,
    text,
)

_MODULES = (relational, events, analytics, text, similarity, extraction_queries)

# Evaluation-window order. Anything not listed here follows in module order.
#
# INVARIANT (tests/test_registry_window.py): every registered query must
# either sit inside the first DRIVER_WINDOW entries of all_queries() or
# already hold an evaluated row in some CORRECTNESS_r*.json. Adding a new
# query therefore REQUIRES placing it in the window (and rotating a
# repeatedly-green entry out) — overflow can no longer ship silently.
DRIVER_WINDOW = 50

_PRIORITY = (
    # ============== round-5 window (exactly DRIVER_WINDOW entries) =======
    # --- new in r05 — first driver rows
    "q_embedding_dup_clusters",  # CC kernel vs WITH RECURSIVE oracle (VERDICT #5)
    "q_doc_source_stats",        # per-source provenance rollup (VERDICT #8)
    # --- changed in r05: every hash-checked finalizer that moved from
    #     numpy decimals-arg rounding to util.round_sql_double (VERDICT
    #     #3) needs a fresh driver row on the new kernel
    "q_events_range_join",
    "q_events_user_range_join",
    "q_embedding_label_centroid",
    "q_events_moving_avg",
    "q_lineitem_profile",
    "q_doc_tfidf",
    "q_doc_lm_score",
    "q_doc_priority_sample",
    "q_doc_bm25",
    "q_doc_entropy",
    "q14_promo_revenue",
    "q17_small_qty_revenue",
    "q19_brand_band_revenue",
    "q8_market_share",
    # rows-only siblings of the same conversion
    "q_doc_minhash_pairs",
    "q_doc_compress_ratio",
    "q_embedding_pq",
    # bloom key path gained _bloom_key_ints (string support)
    "q_semi_join_bloom",
    # extraction flagship + xlsx upgraded from rows-only to HASH-CHECKED
    # vs the oracle-materialized flat parquet (VERDICT #4); credits /
    # usage_summary ride the same (edited) dynamic_oracles() mechanism
    "q_extract_documents",
    "q_extract_xlsx",
    "q_extract_credits",
    "q_extract_usage_summary",
    # --- VERDICT r04 item 2: rotated-out entries whose r04 code change
    #     never received a driver row on current code
    "q5_region_revenue",     # auto_equi_join 3-join composition
    "q_ann_ivf",             # zero-copy _stack family
    "q_ann_lsh",
    "q_embedding_label_stats",
    "q_knn_label_votes",
    "q_full_outer_status",   # hash_bucket_col rewrite
    "q_extract_ooxml",
    "q_extract_kind_stats",
    "q_lineitem_quantiles",  # r03 bench-tail pair, last row r02
    "q_orders_running_total",
    # --- oldest-evidence refresh: unchanged code, but last driver row is
    #     r02 — periodic re-evidencing beats letting rows go stale
    "q1_pricing_summary",
    "q6_revenue_filter",
    "q_acctbal_buckets",
    "q_cust_dense_rank",
    "q_distinct_flags",
    "q_doc_exact_dedup",
    "q_doc_fingerprint",
    "q_events_daily_distinct",
    "q_events_hourly",
    "q_events_lag_delta",
    "q_events_last_event",
    "q_events_user_stats",
    "q_lineitem_global_stats",
    "q_lineitem_unpivot",
    "q_orders_by_month",
    "q_orders_rollup",
    # ---------------- below here = past the driver window ----------------
    # Rotation rationale (policy: rotate out entries that are r04
    # hash-green AND unchanged in r05, or whose r05 change is a shared
    # kernel already represented in-window by siblings):
    # - The r04 TPC-H block (q2/q3/q4/q7/q9/q11/q12/q13/q15/q16/q18/
    #   q20/q21/q22, q_orders_cube, q_orders_percent_rank, q10) is
    #   double-green (r03+r04 or r04 hash-green) and untouched in r05
    #   except the four ratio-rounding members kept in-window above.
    # - q_dup_clusters_distributed: rows-only by nature (LSH candidate
    #   generation is not SQL-expressible); the shared cc_min_label
    #   kernel is now HASH-CHECKED in-window via q_embedding_dup_clusters.
    # - q_word_topk / q_word_heavy_hitters / q_lang_heavy_hitters /
    #   q_doc_decontaminate / q_doc_mixture_resample /
    #   q_doc_temperature_resample / q_doc_bpe_tokens /
    #   q_doc_paragraph_dedup / q_doc_trimmed_stats / q_cust_cume_dist /
    #   q_doc_split_assign / q3_top_orders / q_ann_topk /
    #   q_embedding_near_dup / q_events_sessionize etc.: r04 hash-green,
    #   unchanged in r05, pytest-gated at both SFs.
    "q3_top_orders",
    "q_ann_topk",
    "q_embedding_near_dup",
    "q_word_topk",
    "q_word_heavy_hitters",
    "q_lang_heavy_hitters",
    "q_lineitem_corr_by_flag",
    "q_cust_cume_dist",
    "q_dup_clusters_distributed",
    "q_doc_decontaminate",
    "q_doc_mixture_resample",
    "q_doc_temperature_resample",
    "q_doc_bpe_tokens",
    "q_doc_paragraph_dedup",
    "q_doc_trimmed_stats",
    "q_doc_split_assign",
    "q_doc_neardup_keep",
    "q_orders_cube",
    "q_orders_percent_rank",
    "q4_order_priority",
    "q22_idle_customers",
    "q7_nation_volume",
    "q15_top_supplier",
    "q13_count_distribution",
    "q18_large_orders",
    "q16_brand_supplier_count",
    "q11_important_parts",
    "q20_heavy_suppliers",
    "q21_sole_late_supplier",
    "q2_min_price_supplier",
    "q9_nation_profit",
    "q12_late_lines",
    "q10_returned_items",
    "q_top_orders_per_segment",
    "q_nation_customer_stats",
    "q_media_features",
    "q_media_frame_sample",
    "q_doc_curation",
    "q_doc_repetition",
    "q_doc_pack_sequences",
    "q_events_sessionize",
    "q_cust_order_counts",
    "q_top_customers",
    "q_embedding_clusters",
    "q_intersect_all_custkeys",
    "q_except_all_custkeys",
    "q_price_quantiles_by_flag",
    "q_doc_chunks",
    "q_doc_sample",
    "q_doc_stratified_sample",
    "q_doc_explode_tokens",
    "q_doc_rolling_fingerprint",
    "q_dup_clusters",
    "q_price_quantiles_sketch",
    "q_events_json_extract",
    "q_events_scrub",
    "q_events_user_hll",
    "q_orders_global_rownum",
    "q_doc_token_counts",
    "q_doc_quality",
    "q_doc_langid",
    "q_semi_join_customers",
    "q_anti_join_customers",
    "q_set_ops_customers",
    "q_sort_topk_lineitem",
    "q_events_asof",
    "q_events_sliding",
    "q_events_funnel",
    "q_quantity_quantiles_by_flag",
    "q_intersect_customers",
    "q_union_distinct_customers",
    "q_events_retention",
    "q_orders_pivot",
    "q_doc_lang_stats",
    "q_doc_simhash",
    "q_doc_simhash_pairs",
)


def _ordered(full: dict) -> dict:
    out = {k: full[k] for k in _PRIORITY if k in full}
    out.update({k: v for k, v in full.items() if k not in out})
    return out


def all_queries() -> dict:
    full = {}
    for mod in _MODULES:
        full.update(mod.QUERIES)
    return _ordered(full)


def all_oracles() -> dict:
    full = {}
    for mod in _MODULES:
        full.update(mod.ORACLE)
        # oracle SQL that must be generated at call time (e.g. extraction
        # admission/billing oracles embed the deterministic corpus path
        # and materialize the corpus first)
        dyn = getattr(mod, "dynamic_oracles", None)
        if dyn is not None:
            full.update(dyn())
    return _ordered(full)
