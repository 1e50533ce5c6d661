"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship EP1-shaped pipeline query on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 (+ Tier-B relational surface + north-star ops), each
checked against DuckDB at sf0.01 by the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from priority_data_pipeline_azure_sql_db_spark.queries import QUERIES, ORACLE_SQL, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    EP1 end-to-end: watermark filter → $expand-style nest → explode
    sub-form → lowercase+audit → revenue-per-customer aggregation.
    """
    return flagship(spark, "/root/testdata/sf0.001")


# The correctness driver evaluates the first 50 registry entries in order.
# Round-4 rotation (the reshuffle promised in round 3): the 10 queries
# registered after the round-2 freeze (winnowing, sampling, profiling,
# quantization, multi-res rollup, streaming dedup/join, cleaning pass) now
# lead the window, followed by the round-4 additions (SimHash pair
# retrieval, capped production near-dup paths). To make room, 13 queries
# that are driver-green in MULTIPLE prior rounds (r1+r2+r3 triple- or
# r2+r3 double-confirmed, unchanged since) rotate below the window:
#   pipeline_watermark_filter, pipeline_flatten_subform,
#   pipeline_audit_columns, pipeline_project_drop, pipeline_merge_upsert,
#   pipeline_config_flatten, type_mapping_enrichment,
#   embedding_near_dup_pairs, events_pivot_types, scalar_date_math_funcs,
#   q7_volume_shipping, q8_market_share, q13_customer_distribution.
# Every oracle-backed registered query has ≥1 driver-green round on
# record once this window reports; the rows-only tail is unchanged.
CHECK_ORDER = [
    # never-driver-verified first: post-r2-freeze additions
    "text_winnow_fingerprints",
    "dedup_winnow_pairs",
    "sample_documents_hash",
    "sample_stratified_mix",
    "profile_documents_stats",
    "embedding_quantize_int8",
    "events_multires_rollup",
    "streaming_dedup_events",
    "streaming_stream_stream_join",
    "text_cleaning_pass_profile",
    # round-4 additions (capped production near-dup + SimHash retrieval)
    "dedup_jaccard_pairs_capped",
    "dedup_winnow_pairs_capped",
    "dedup_simhash_pairs",
    # flagship + single-confirmed pipeline/operator surface
    "pipeline_e2e_flagship",
    "pipeline_cast_types",
    "pipeline_catalog_top1",
    "pipeline_probe_counts",
    "odata_source_scan",
    # events / temporal joins (single r2/r3 window streak)
    "events_json_extract",
    "events_sessionize",
    "events_tumbling_hourly",
    "asof_last_click_before_error",
    "range_join_close_events",
    "scalar_regex_funcs",
    "window_range_trailing_30d",
    # TPC-H batch
    "q9_product_profit",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q22_idle_customers",
    # LLM-data-pipeline operators (oracle-backed)
    "dedup_exact_docs",
    "dedup_fingerprint_docs",
    "dedup_ngram_jaccard",
    "text_token_stats",
    "text_quality_score",
    "text_langid_heuristic",
    "text_tfidf_top_terms",
    "ann_cosine_topk",
    "embedding_centroids",
    "multimodal_binary_meta",
    "skew_salted_join",
    "streaming_tumbling_counts",
    "streaming_session_counts",
    # rows-only by design (non-SQL-expressible)
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk_lsh",
    "ann_cosine_topk_ivf",
    "approx_sketches",
    "multimodal_frame_sample",
    "streaming_stateful_user_totals",
]


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in CHECK_ORDER if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each queries() entry (omissions
    are genuinely non-SQL-expressible ops → weaker rows-only check)."""
    return _ordered(dict(ORACLE_SQL))
