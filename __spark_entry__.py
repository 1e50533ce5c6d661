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
# Round-6 rotation. Priority: (1) the 8 never-driver-checked entries — the
# two r5 reds, both restructured this round (pack_training_sequences now
# graded on the SHARDED variant with BIGINT-cast oracle columns;
# embedding_normalize flattened via posexplode — see ARCHITECTURE.md
# "Oracle-comparator contract"), the 4 late-r5 registrations, and the 2
# new r6 operators (merge-table BPE, greedy never-split packing);
# (2) queries over round-6-touched code: events_tumbling_hourly
# (date_trunc rewrite), q21_last_shipper (pre-aggregated plan),
# embedding_near_dup_pairs (id-dtype generalization in similarity.py),
# odata_source_scan + pipeline_e2e_flagship (odata reader: $orderby
# resolution, filtered $count, tz conversion); (3) staleness repayment —
# the 30 queries last driver-checked in ROUND 1 (TPC-H family, joins,
# set ops, window/scalar funcs: five rounds on untouched code, but
# 2+-round-unchecked is the hygiene bound, and all are locally
# re-verified under the new driver-replica comparator this session), then
# 7 of the round-3 bucket (the pipeline surface + events_pivot_types,
# preferring touched load paths). Below the window: the remaining r3
# stragglers (q8, q13, scalar_date_math, type_mapping_enrichment — next
# round's head), the r4 bucket, and everything green r5 on code untouched
# this round (clustering, winnowing, jaccard, simhash, streaming, text
# quality family — all also locally green this session).
CHECK_ORDER = [
    # never driver-checked: r5 reds (both restructured r6) ...
    "pack_training_sequences",
    "embedding_normalize",
    # ... late-r5 registrations ...
    "pack_document_chunks",
    "text_vocab_topk",
    "pipeline_curation_e2e",
    "ann_ivf_index_persisted",
    # ... and the round-6 additions
    "text_bpe_tokens",
    "text_bpe_train",
    "pack_greedy_sequences",
    "text_lm_quality_score",
    "sample_epoch_shuffle",
    "export_training_shards",
    "pipeline_curation_v2",
    # round-6-touched code paths
    "events_tumbling_hourly",
    "q21_last_shipper",
    "q21_last_shipper_preagg",
    "embedding_near_dup_pairs",
    "odata_source_scan",
    "pipeline_e2e_flagship",
    # staleness repayment: last driver-checked round 1
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_orders",
    "top_customers_by_revenue",
    "agg_distinct_suppliers",
    "percentiles_quantity",
    "rollup_lineitem_status",
    "cube_orders_status_priority",
    "grouping_sets_lineitem",
    "pivot_segment_by_region",
    "join_left_outer_nulls",
    "join_full_outer",
    "semi_join_customers_with_orders",
    "anti_join_customers_without_orders",
    "setop_nation_intersect",
    "setop_nation_except",
    "union_all_distinct",
    "window_running_total",
    "window_lag_lead_ntile",
    "window_topk_orders_per_customer",
    "scalar_string_funcs",
    "scalar_array_funcs",
    "conditional_null_funcs",
    "pipeline_count_rows",
    "pipeline_limit_probe",
    # staleness repayment: last driver-checked round 3 (7 of 11)
    "pipeline_watermark_filter",
    # (pipeline_flatten_subform / pipeline_audit_columns /
    # pipeline_project_drop / pipeline_config_flatten /
    # events_pivot_types / q7_volume_shipping displaced by the round-6
    # registrations — the r3 stragglers q7/q8/q13/scalar_date_math/
    # type_mapping/config_flatten/project_drop/audit_columns/
    # flatten_subform/pivot_types lead next round's window)
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
