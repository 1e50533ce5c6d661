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
# Round-9 rotation: driver evidence for the 44 round-8 late
# registrations (VERDICT r8 ask #1 — "front the r9 window with all 44
# in the documented order, then 6 of the r6 bucket"). Priority:
# (1) all 44 round-8 late registrations, in their queries.py
# registration order (the order VERDICT r8 documents). Four of them
# carry round-9 code+oracle changes and are therefore ALSO the
# highest-divergence-risk entries this round: dedup_duplicated_spans
# and dedup_span_removal now pass max_gram_freq and replay the cap in
# the oracle as a doc-frequency CTE (r8 "What's wrong" #1);
# er_fuzzy_customer_pairs and er_golden_records now block on the
# compound (nation, name-prefix) key with the identical prefix
# expression in the oracle (r8 "What's wrong" #2; pigeonhole
# segmentation was measured and rejected — the fixture names' constant
# prefix gives segment blocking zero pruning power).
# (2) the first 6 entries of the 42-entry r6 bucket, in r6 order
# (pack/embedding/text/curation) — 3 rounds stale at this check.
# 44 + 6 = 50.
#
# ROTATION ARITHMETIC (r8 ask #4 — the published covering schedule):
# registry 182 + ≤10 new per round ≈ 190-200 entries over a 50-slot
# window ⇒ a full cycle takes ceil(190/50) = 4 rounds, so the
# achievable invariant is "every entry re-checked at least every 4th
# round" — max staleness 3 rounds, adopted as the STATED invariant
# from this round on (the old ≤2 was arithmetically unkeepable at
# 182 entries, as VERDICT r8 proved). Concrete schedule from here:
#   r9  (this file): 44 never-checked r8 regs + r6 bucket[0:6]
#   r10: r6 bucket[6:42] (36, 3-stale) + r9 late regs (never) +
#        r7 bucket head — fills to 50
#   r11: r7 bucket remainder + r8 bucket head — fills to 50
#   r12: r8 bucket remainder + r9-window entries turning 3-stale
# Under this round-robin no entry's age ever exceeds 3 rounds as long
# as net registration stays ≤10/round (this round adds 5).
# Below the window: the r6 bucket remainder (36, lead r10), the r7
# bucket (46), the r8 bucket (50), and this round's 5 late
# registrations (pipeline_refresh_cdc_audit, er_blocking_skew_audit,
# er_incremental_match, streaming_scd2_maintenance,
# er_assign_to_golden) — all comparator-verified locally at sf0.01
# AND sf0.1 this session (and under a vanilla session). ALSO
# r10-head material: four entries had code/oracle CHANGES this round
# and should precede their buckets' rotation order at the r10 window
# head — multimodal_frame_sample, pack_greedy_sequences, and
# streaming_stateful_user_totals were upgraded from rows-only to full
# hash oracles (md5 frame projection / recursive-CTE greedy walk /
# final-state projection), and dedup_boilerplate_lines' operator
# gained the non-empty-kept drop_empty contract.
CHECK_ORDER = [
    # (1) the 44 round-8 late registrations, registration order
    "dedup_duplicated_spans",
    "text_quality_classifier",
    "sample_temperature_mix",
    "dedup_boilerplate_lines",
    "filter_quality_quantile",
    "sample_curriculum_rank",
    "pipeline_snapshot_diff",
    "events_rollup_incremental",
    "events_scd2_user_state",
    "sample_source_cap",
    "dedup_gram_novelty",
    "pipeline_curation_v3",
    "dedup_span_removal",
    "profile_quantization_error",
    "multimodal_phash_dedup",
    "pipeline_curation_funnel",
    "multimodal_phash_near_dup",
    "export_curriculum_shards",
    "events_session_sequences",
    "sample_eval_balanced",
    "profile_table_stats",
    "ann_negative_samples",
    "streaming_rollup_maintenance",
    "er_fuzzy_customer_pairs",
    "er_golden_records",
    "events_pit_enrichment",
    "sample_soft_dedup",
    "text_zipf_coverage",
    "events_conversion_funnel",
    "events_cohort_retention",
    "events_transition_matrix",
    "dq_validation_report",
    "events_value_outliers",
    "events_ab_lift",
    "profile_value_histogram",
    "events_gapfill_hourly",
    "events_scd2_incremental",
    "events_conversion_latency",
    "dq_k_anonymity",
    "profile_join_skew",
    "profile_quality_drift",
    "profile_corpus_fingerprint",
    "sample_multi_epoch_plan",
    "profile_source_dup_pressure",
    # (2) r6 bucket head (3 rounds stale), r6 order
    "pack_training_sequences",
    "embedding_normalize",
    "pack_document_chunks",
    "text_vocab_topk",
    "pipeline_curation_e2e",
    "text_lm_quality_score",
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
