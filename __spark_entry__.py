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
# Round-11 rotation: the window VERDICT r10 published (ask #1), resolved
# against the hard 50-slot limit. Composition, in order:
# (1) the 10 round-10 late registrations, registry order — their first
#     driver evidence (VERDICT r10's done criterion), and themselves the
#     divergence-risk head: multimodal_video_frames / multimodal_codec_mix
#     carry the r10 codec spec-agreement oracle changes (and codec_mix
#     was upgraded AGAIN this round to the six-way profile incl. GIF —
#     comparator-verified at sf0.01 AND sf0.1 the session it changed),
#     export_curriculum_readback the physical-file-order check, and
#     er_first_token_pairs was upgraded THIS round to the multi-pass
#     (first-token ∪ last-token) blocking union (VERDICT r10 ask #4).
# (2) the 40-entry r7 bucket, r7 window order — every entry last checked
#     in round 7, turning 3-rounds-stale at this check (the staleness
#     invariant's edge). This sweeps in 9 of the 16 token-count-changed
#     oracle replays (profile_data_card, sample_source_budget,
#     export_training_shards, export_jsonl_corpus, pipeline_curation_v2,
#     sample_quality_weighted, pack_training_sequences_bpe,
#     text_bpe_tokens, text_bpe_train).
# 10 + 40 = 50 exactly: the two hard constraints (all r10 registrations
# + the whole r7 bucket) consume the full window, so the REMAINING
# changed-oracle divergence-risk set — ann_cosine_topk_lsh (rows-only →
# full hash oracle) and the r8-bucket token-count/shingle replays
# (text_quality_score, text_token_stats, text_cleaning_pass_profile,
# dedup_contamination_check, pack_materialized_sequences,
# pipeline_curation_incremental, dedup_fingerprint_docs,
# text_winnow_fingerprints, dedup_winnow_pairs, dedup_ngram_jaccard,
# dedup_minhash_lsh, dedup_simhash, dedup_simhash_pairs,
# multimodal_real_codec) — rides at the r12 head with its own bucket:
# they are ALL r8-bucket members, so r12 re-checks them on schedule
# anyway. Each was comparator-verified at sf0.01 (and the oracle-text
# set at sf0.1) the session it changed, plus full-sweep green.
#
# LATE ROUND-11 DEFINITIONS PASS (published-definition review over the
# analytics family — see SURVEY.md): five entries changed code AND
# oracle — events_conversion_funnel + events_conversion_latency
# (ordered-subsequence semantics replacing the undercounting
# global-MIN shortcut; latency floors the elapsed microseconds),
# profile_quality_drift (KS at fix6 resolution — the 10k-bin form
# could read 0.0 on fully drifted data), embedding_quantize_int8 +
# profile_quantization_error (round-half-away-from-zero, the published
# symmetric-absmax convention). Each verified at sf0.01 AND sf0.1 the
# session it changed. Bucket placement: embedding_quantize_int8 is r8
# bucket (r12 on schedule); the other four are r9 bucket (r13) — all
# five are divergence-risk HEAD material for their window.
#
# ROTATION ARITHMETIC: window 50 × 4-round cycle = 200-entry registry
# CEILING for the ≤3-round staleness invariant. Registry stands at 199
# (196 carried + ann_cosine_topk_ivf RETIRED in favor of the new
# ann_cosine_topk_ivf_full — VERDICT r10 ask #5: the full-probe twin is
# EXACT, hash-checked against the brute-force oracle, so the rows-only
# set shrinks to 8 and ann_ivf_index_persisted is the lone approximate
# ANN rows-only — + multimodal_gif_codec, ask #8, +
# events_scd2_with_deletes, the Kimball-review delete-handling gap).
# ONE registration remains below the ceiling; beyond 200, retire an
# entry each. Schedule from here:
#   r11 (this file): r10 late regs (10) + r7 bucket (40)
#   r12: r8 bucket (47 after the ivf retirement, incl.
#        ann_cosine_topk_lsh + the changed-oracle replays named above)
#        + r11's 3 late registrations (ann_cosine_topk_ivf_full,
#        multimodal_gif_codec — the GIF decoder's every-pixel md5
#        check — and events_scd2_with_deletes; each comparator-verified
#        at sf0.01 AND sf0.1 the session it landed) = 50 exactly
#   r13: r9 bucket (49) + 1 slack
#   r14: r10 bucket (50)
#   r15: r11 bucket (50)
#
# Previous round's comment (kept for the audit trail):
# Round-10 rotation: the window VERDICT r9 published verbatim
# (`__spark_entry__.py:59-73` of the r9 file; VERDICT r9 ask #1).
# Composition, in order:
# (1) the four entries whose code/oracle CHANGED in round 9 — the
# divergence-risk head: multimodal_frame_sample, pack_greedy_sequences,
# and streaming_stateful_user_totals were upgraded from rows-only to
# full hash oracles, dedup_boilerplate_lines' operator gained the
# non-empty-kept drop_empty contract.
# (2) the 36-entry r6 bucket remainder, in r6 window order — these
# turned 3 rounds stale at this check, the staleness invariant's edge.
# (3) the 5 round-9 late registrations, registration order — their
# first driver evidence.
# (4) the r7 bucket head (5 entries, r7 window order; the bucket's
# pack_greedy_sequences already sits at the window head) — fills to 50.
#
# ROTATION ARITHMETIC (the ≤3-round staleness covering schedule,
# adopted in r9): registry 197 (10 added r10) + ≤10 new per round over a 50-slot
# window ⇒ full cycle ceil(~190/50) = 4 rounds ⇒ max staleness 3.
# Schedule from here:
#   r10 (this file): changed-head 4 + r6 bucket[6:42] + r9 regs (5) +
#        r7 bucket[0:5]
#   r11: r7 bucket remainder (40) + r8 bucket head + this round's
#        late registrations at the head — fills to 50
#   r12: r8 bucket remainder + r9-window entries turning 3-stale
# Below the window: the r7 bucket remainder (lead r11), the r8 bucket
# (50), the r9-window bucket, and this round's late registrations —
# er_assign_from_store (the persisted-ER serve, r9 ask #2),
# er_first_token_pairs (free-text blocking, r9 ask #3),
# export_curriculum_readback (the shard-order round trip, r9 ask #4),
# multimodal_codec_mix (the codec-mix profile incl. the new
# progressive-JPEG class, r9 ask #8), er_store_append_serve
# (append ≡ rebuild end to end: store built from part of the base,
# rest appended, served against the full-base oracle), and the three
# md5-portable hash-family twins dedup_minhash_lsh_md5,
# dedup_simhash_md5, and dedup_simhash_pairs_md5 (full SQL oracles
# for the previously rows-only MinHash/SimHash constructions, incl.
# the pigeonhole Hamming retrieval), plus streaming_er_maintenance
# (the fourth streaming-warehouse leg: multi-batch drain through the
# ER store's build+append path ≡ the one-pass cluster map) and
# multimodal_video_frames (REAL video: MJPEG-in-AVI mux/demux + kept-
# frame JPEG decode, structure-hash-checked like multimodal_codec_mix)
# — each comparator-verified at sf0.01 AND sf0.1 the session it
# landed; all r11-head material. Also r11-head (changed-oracle
# divergence risk): ann_cosine_topk_lsh, upgraded rows-only → full
# hash oracle (the hyperplanes were md5-derived all along, so the
# DuckDB twin regenerates them bit-identically — registry now
# 197 queries / 188 oracled / 9 rows-only by design).
#
# LATE ROUND-10 REVIEW FIXES (seven adversarial passes, see SURVEY.md):
# every entry whose code or oracle changed was comparator-verified at
# sf0.01 the session it changed (plus a full 188-query sweep), and the
# oracle-TEXT-changed set also at sf0.1. Additional r11 window-head
# material (changed-oracle divergence risk): the 16 token-count
# replays upgraded to the list_filter zero-for-empty form
# (text_quality_score, text_token_stats, text_cleaning_pass_profile,
# profile_data_card, sample_source_budget, pack_training_sequences,
# pack_materialized_sequences, pack_document_chunks,
# export_training_shards, export_jsonl_corpus, pipeline_curation_v2/
# v3/e2e/incremental, dedup_contamination_check, sample_quality_weighted),
# text_lm_quality_score (doc-universe left join: 0/1-token docs now
# score (0, NULL)), export_curriculum_readback (ranks by PHYSICAL file
# order — the check is now sensitive to an unsorted shard), and
# events_conversion_latency (empty-converter edge now (0, NULL)).
# The codec spec-agreement passes also changed: multimodal_real_codec
# (symmetric WAV scaling — the oracle's PCM term simplifies to the
# exact (b-128)/128), multimodal_frame_sample (IN THE r10 WINDOW HEAD:
# frame_index = SOURCE frame number + value-checked provenance column),
# and multimodal_video_frames (same frame_index semantics; r11-head).
# WIDEST oracle change (text/dedup published-algorithm agreement pass):
# every token-array oracle moved to the empty-token-free list_filter
# form and the 6 fingerprint replays flipped to collapse-before-trim —
# identical values on this fixture (no tab/newline-padded texts), full
# 188-sweep green post-change; the whole shingle/fingerprint family is
# therefore r11-head divergence-risk material alongside the entries
# named above.
CHECK_ORDER = [
    # (1) the 10 round-10 late registrations — first driver evidence,
    # registry order; the head carries this round's divergence risk
    "er_assign_from_store",
    "er_first_token_pairs",
    "export_curriculum_readback",
    "multimodal_codec_mix",
    "er_store_append_serve",
    "dedup_minhash_lsh_md5",
    "dedup_simhash_md5",
    "dedup_simhash_pairs_md5",
    "streaming_er_maintenance",
    "multimodal_video_frames",
    # (2) the r7 bucket (40, turning 3-rounds-stale), r7 window order
    "pack_training_sequences_bpe",
    "embedding_near_dup_indexed",
    "profile_data_card",
    "streaming_merge_staging",
    "export_jsonl_corpus",
    "sample_source_budget",
    "sample_quality_weighted",
    "embedding_dedup_canonical",
    "text_bpe_tokens",
    "text_bpe_train",
    "sample_epoch_shuffle",
    "export_training_shards",
    "pipeline_curation_v2",
    "embedding_near_dup_pairs",
    "dedup_winnow_pairs_capped",
    "dedup_jaccard_pairs_capped",
    "multimodal_binary_meta",
    "ann_ivf_index_persisted",
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
]


def _ordered(mapping: dict, strict: bool = False) -> dict:
    # strict (the queries() path) fails LOUD on a stale window:
    # silently dropping a retired/renamed CHECK_ORDER name would shrink
    # the 50-slot window and slide in an arbitrary registry-order
    # entry, violating the staleness schedule undetected (review
    # finding; test_check_order_window_integrity is the pytest twin).
    # oracle_sql() stays lenient — rows-only entries are legitimately
    # absent from the oracle mapping.
    if strict:
        missing = [n for n in CHECK_ORDER if n not in mapping]
        if missing:
            raise ValueError(
                f"CHECK_ORDER names not in the registry: {missing} — "
                "update the rotation window in __spark_entry__.py"
            )
    head = {n: mapping[n] for n in CHECK_ORDER if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(QUERIES), strict=True)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each queries() entry (omissions
    are genuinely non-SQL-expressible ops → weaker rows-only check)."""
    return _ordered(dict(ORACLE_SQL))
