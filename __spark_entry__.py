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
# Round-7 rotation. Priority: (1) the 17 never-driver-checked round-7
# registrations (resident dedup + near-dup twins, wide epoch shuffle,
# Arrow BPE kernel + large-vocab train/tokenize, BPE-budget packing,
# real-codec multimodal, data card, streaming-merge sink check, JSONL
# export, source-budget mixing, incremental curation, length-bucket
# batching, sequence materialization, weighted sampling, semantic
# canonical dedup);
# (2) queries over round-7-touched code: the BPE family (self-delimited
# symbol spelling + batched trainer), the shuffle/curation family
# (shard_width parameter, position-keyed order tag, deterministic export
# paths), embedding_near_dup_pairs (string-id cross-cell kernel fix),
# pack_greedy_sequences (vectorized shard scan), the one-shot capped
# dedup twins (oracle SQL refactored to shared constants),
# multimodal_binary_meta (extract_features schema gained the codec
# column), ann_ivf_index_persisted (deterministic index path);
# (3) staleness repayment — ALL 10 round-3 stragglers (promised at the
# head of this window in round 6) and 13 of the 17-query round-4 bucket
# (the 4 displaced entries lead next round, see the tail comment);
# (4) the oldest round-5 entries on code adjacent to this round's
# changes (winnow fingerprints feed the new dedup index; exact dedup and
# token stats feed the curation pipeline). Below the window: the rest of
# the r5 bucket (streaming + text quality + ANN families, untouched this
# round) and everything green r6 on untouched code — all locally
# re-verified under the driver-replica comparator this session.
CHECK_ORDER = [
    # (1) never driver-checked round-7 registrations
    "dedup_winnow_pairs_indexed",
    "dedup_jaccard_pairs_indexed",
    "sample_epoch_shuffle_wide",
    "text_bpe_tokens_arrow",
    "text_bpe_tokens_large",
    "multimodal_real_codec",
    "pack_training_sequences_bpe",
    "embedding_near_dup_indexed",
    "profile_data_card",
    "streaming_merge_staging",
    "export_jsonl_corpus",
    "sample_source_budget",
    "pipeline_curation_incremental",
    "pack_length_bucket_batches",
    "pack_materialized_sequences",
    "sample_quality_weighted",
    "embedding_dedup_canonical",
    # (2) round-7-touched code paths
    "text_bpe_tokens",
    "text_bpe_train",
    "sample_epoch_shuffle",
    "export_training_shards",
    "pipeline_curation_v2",
    "embedding_near_dup_pairs",
    "pack_greedy_sequences",
    "dedup_winnow_pairs_capped",
    "dedup_jaccard_pairs_capped",
    "multimodal_binary_meta",
    "ann_ivf_index_persisted",
    # (3) staleness repayment: the 10 round-3 stragglers
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "scalar_date_math_funcs",
    "type_mapping_enrichment",
    "pipeline_config_flatten",
    "pipeline_project_drop",
    "pipeline_audit_columns",
    "pipeline_flatten_subform",
    "events_pivot_types",
    # (3) staleness repayment: the full round-4 bucket
    "q9_product_profit",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q22_idle_customers",
    "asof_last_click_before_error",
    "range_join_close_events",
    "skew_salted_join",
    "window_range_trailing_30d",
    "profile_documents_stats",
    "pipeline_catalog_top1",
    "pipeline_probe_counts",
    # (multimodal_frame_sample displaced by the round-7 registrations:
    # it is rows-only — the weakest driver check — and its fan-out
    # slicing is directly pytest-covered; leads next round with the
    # r5 streaming bucket)
    # Below the window, leading next round's head: the last four r4
    # entries (scalar_regex_funcs, sample_stratified_mix, approx_sketches,
    # multimodal_frame_sample — all green-when-last-checked, displaced
    # because EVERY round-7 registration belongs inside the driver gate
    # per the verify skill's window rule; new code has strictly higher
    # driver-divergence risk than untouched always-green code).
    # (tier 4 emptied: the round-7 registrations filled the window.
    # The r5 winnowing/jaccard/exact-dedup logic is still hash-checked
    # every round through the capped + indexed twins and the curation
    # capstones, whose oracles replay those pipelines verbatim. Next
    # round's head: the remaining r5 bucket — streaming family first,
    # then text quality + ANN.)
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
