"""Query catalog: every operator from SURVEY.md §2 is exposed as a
named query over the testdata tables, each paired (where SQL can
express it) with a DuckDB oracle string for the correctness harness.

Importing this package populates the registry.
"""

from .registry import REGISTRY, Query, register  # noqa: F401

from . import crm, datapipe, events, mlmetrics, mltrain, olap, relational  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "register", "all_queries"]

# The correctness harness checks the first 50 registry entries; the
# dict order below is deliberate. _TAIL holds the queries parked
# OUTSIDE that window this round — every parked query is still
# registered and exact-equality verified locally each round
# (tools/check.py, stronger than the driver's value-hash).
#
# STEADY-STATE ROTATION POLICY (the contract the parking below
# implements, stated once so every future round follows it):
#   R1. New queries enter the driver window in their BIRTH round —
#       no more "parked at birth".
#   R2. No registered query is parked for more than 2 consecutive
#       rounds: parked in rounds k and k+1 ⇒ in-window in round k+2.
#   R3. Every parked query is exact-equality green under
#       tools/check.py in the round it is parked (recorded in the
#       round's closing commit), so "parked" never means "unchecked".
#   R4. Registry growth per round stays ≤ the window turnover
#       (window 50, so growth + rule-R2 rejoins must fit in 50;
#       with N registered this is satisfiable while N ≤ 150).
#   R5. Preference order when choosing parks: (a) variants whose §2
#       coverage has an in-window sibling, then (b) beyond-reference
#       ops, then (c) §2-unique queries that were driver-green in
#       the immediately previous round — never two rounds running
#       (that is R2).
# Per-round rotation rationale lives in COVERAGE.md ("Rotation
# history"); this comment carries only the policy and the CURRENT
# round.
#
# Round-12 rotation (56 parked / 50 in-window / 106 registered):
# The THIRTY entries parked since round 10 hit their R2 deadline and
# ALL rejoin the driver window. The round-11 parks stay parked one
# more round (R2 deadline r13) EXCEPT ngram_jaccard_dedup_idf and
# minhash_near_dup, which rejoin EARLY because their shared
# implementations changed. One round-12 newcomer (ann_filtered_topk —
# predicate-filtered exact top-k, the filtered-vector-search
# primitive) enters in its birth round per R1. Every query whose
# executed plan changes in round 12 sits in-window so CORRECTNESS_r12
# proves it green post-change (cross_sell_recommendations and
# textrank_keywords — sql-statement construction;
# ngram_jaccard_dedup/_idf — footer-metadata count; the six
# dedup-family consumers of near_dup_pairs/incremental_near_dup —
# SQL-string minhash constructors; benchmark_decontamination_bloom —
# probe-position projection; the suffix family — cap-metadata
# stamping). In exchange round-11-driver-green entries park per R5 —
# groups (a)/(b)/(c) annotated inline below; R2 deadline r14.
_TAIL = (
    # -- parked round 12 (driver-green r11), per R5; R2 deadline = r14 --
    # (a) family variants whose base / §2 sibling is in-window:
    "simhash_fingerprints",  # fingerprint family; rolling_hash_fingerprints rejoins
    "ann_lsh_topk",  # ANN family; lsh_multitable/ivf/pq/rerank/bruteforce rejoin
    "ann_ivf2_topk",  # ann_ivf_topk rejoins
    "document_token_ids",  # tokenizer family; bpe_vocab rejoins
    "document_bpe_ids",  # tokenizer family; bpe_vocab rejoins
    "repeated_span_removal",  # span family; exact_repeat_removal stays in-window
    "event_tumbling_windows",  # ST5; event_sliding_windows rejoins
    "sales_rollup_cube",  # A5; order_priority_pivot rejoins
    "customers_with_urgent_orders",  # J7 semi; anti twin rejoins
    "weekly_order_rollup",  # A2/F22 (daily twin also parks below — both
    #   one round only per R2, covered by tests/test_relational_queries)
    # (b) beyond-reference ops green r11:
    "stratified_sample",
    "dataset_temperature_mix",
    "perplexity_filter_by_lang",
    "length_bucketed_batches",
    "semantic_dedup",
    "dsir_importance_weights",
    "range_join_incidents",
    "order_value_histogram",
    "balance_outliers_zscore",  # nation_balance_quantiles rejoins
    # (c) §2 rows green in round 11, one round only (deadline r14):
    "deterministic_pred_id",  # F20
    "ab_bucket_allocation",  # F21/ML15
    "domain_extraction",  # F3
    "pricing_summary",  # A3/A7
    "incremental_watermark_sync",  # S7/ST2; streaming tests keep
    #   covering it (parked in exchange for textrank_keywords, whose
    #   plan changed in round 12 and therefore sits in-window)
    "event_props_json",  # M1/M3 (parked in exchange for
    #   ngram_jaccard_dedup, whose plan changed in round 12)
    "event_funnel_metrics",  # A11 (parked in exchange for
    #   ngram_jaccard_dedup_idf — early rejoin, shared impl changed)
    "decontamination_span_removal",  # (a) span family — exact_repeat_removal,
    #   exact_contamination_spans AND both benchmark twins stay
    #   in-window (parked in exchange for the round-12 newcomer
    #   ann_filtered_topk, which enters in its birth round per R1)
    # -- parked in exchange for the six dedup-family queries whose
    #    shared near_dup_pairs/incremental_near_dup plans changed in
    #    round 12 (SQL-string constructors) and therefore rejoin:
    "filter_projection",  # P1/P3/S1-S3/S8; multi_predicate_filter rejoined;
    #   pushdown stays plan-asserted in tests/test_plan_quality.py
    "topk_per_group",  # W2; pagination + grouped_rank_applyinpandas rejoined
    "global_rank_topn",  # W1/W4/W8
    "label_join",  # J5/A8
    "daily_order_stats",  # A2/F22
    "contract_validation_report",  # A9-A10/P10
    # -- parked round 11 (driver-green r10), per R5; R2 deadline = r13 --
    # (a) family variants whose base / §2 sibling is in-window:
    # (ngram_jaccard_dedup_idf rejoined EARLY in round 12: the shared
    # _ngram_jaccard_impl plan changed — footer-metadata corpus count)
    "repeated_span_stats",  # span family; suffix-exact stats sibling in-window
    "event_sessionization",  # ST5
    "stateful_running_totals",  # ST3; stateful_streaming_dedup stays in-window
    "vocab_construction",  # tokenizer family; bpe_vocab rejoins
    "dataset_mix_downsample",  # sampling family
    "dataset_split_assignments",
    "tfidf_top_terms",  # text-stats family; unigram_lm_quality rejoins
    "sequence_packing",  # packing family
    "document_chunks",  # chunking sibling
    "exact_dedup_documents",  # P9; dedup family keeps embedding_near_dup
    # (b) beyond-reference ops green r10:
    "cluster_balanced_sample",
    "prototypicality_pruning",
    "d4_selection",
    "embedding_int8_quantize",
    "multimodal_features",
    # (c) §2 rows green in round 10, one round only (deadline r13):
    "account_features",  # P2/P8/F7-14; ladder also runs in flagship
    "jaro_winkler_pairs",  # F5
    "token_jaccard_pairs",  # SO2-3/F6; also inside er_match_cascade
    "score_explanations",  # ML9/F16-19; ladders stay via flagship
    "er_threshold_sweep",  # ML12
    "ranking_eval_metrics",  # ML13/W9-10/F23
    "feedback_asof_labels",  # ML14/P11
    "extractive_summary",  # ML16
)


def all_queries() -> dict[str, "Query"]:
    head = {k: v for k, v in REGISTRY.items() if k not in _TAIL}
    tail = {k: REGISTRY[k] for k in _TAIL if k in REGISTRY}
    return {**head, **tail}
