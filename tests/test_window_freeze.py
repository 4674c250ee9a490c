"""Freeze the 50-slot driver verification window (r15, VERDICT item 1).

The r14 round's gate read REGRESSED solely because the interrupted
BUILD round swapped kicc_mart_cdf_batch -> kicc_mart_cdf_timestamped
inside the window.  Any further swap — including a revert — shows up
to the driver as another dropped query.  This test pins the window to
the exact r14 set AND order; it must only ever change together with a
deliberate, documented window swap in a BUILD round.
"""

from etl_job_spark.plans import registry

R14_WINDOW = [
    "kicc_sales_by_store",
    "kicc_sales_by_prod",
    "kicc_enrich_store",
    "kicc_backfill_medium",
    "kicc_mart_sql_dml",
    "kicc_filter_rows",
    "kicc_semi_join",
    "kicc_mart_sql_read",
    "kicc_calendar_plan",
    "kicc_scalar_dates",
    "kicc_mart_versioned",
    "kicc_mart_gdpr",
    "events_mart_evolved_read",
    "text_lang_id",
    "corpus_filter_pipeline",
    "text_tfidf_top_term",
    "text_vocab",
    "text_contamination",
    "corpus_pack_shards",
    "multimodal_frame_sample",
    "multimodal_decode_meta",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "embed_cosine_topk",
    "embed_lsh_topk",
    "kicc_mart_cdf_timestamped",
    "corpus_incremental_dedup",
    "text_stats",
    "corpus_dsir_resample",
    "text_winnowing",
    "pricing_summary",
    "shipping_priority",
    "window_topk_products",
    "kicc_mart_add_column",
    "cube_flags",
    "set_ops",
    "events_json_extract",
    "events_tumbling_hourly",
    "kicc_mart_cdf_updates",
    "orders_month_range_join",
    "kicc_staging_converted",
    "full_outer_year_compare",
    "events_pivot_by_type",
    "events_exact_percentiles",
    "asof_view_attribution",
    "events_sessionize",
    "window_rank_family",
]


def test_driver_window_is_frozen_to_r14():
    assert registry._DRIVER_WINDOW == R14_WINDOW


def test_registry_order_starts_with_the_frozen_window():
    assert list(registry.QUERIES)[:50] == R14_WINDOW
    assert list(registry.ORACLE)[:50] == R14_WINDOW
