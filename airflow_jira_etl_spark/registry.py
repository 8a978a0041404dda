"""Query registry — the implementation contract from SURVEY.md §2B.

Every named query registers itself here via the ``@query`` decorator:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an equivalent ANSI-SQL oracle string for
DuckDB. ``__spark_entry__.py`` simply re-exports these dicts.

Convention (driver contract): column names must match EXACTLY between
the Spark result and the oracle SQL — alias every computed column on
both sides. Float-computed columns are rounded to 4 dp on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as query ``name`` with an optional DuckDB oracle.

    Oracles are drift-proofed at registration: TPC-H table references
    are routed through contract-typed CTEs (``oracle_norm.drift_proof``)
    so the DuckDB side stays type-stable under fixture regeneration,
    mirroring what ``catalog.conform`` already guarantees on the Spark
    side. No-op on today's fixtures; tests/test_tpch_drift_sweep.py is
    the behavioral gate."""
    from airflow_jira_etl_spark.oracle_norm import drift_proof

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = drift_proof(oracle)
        return fn

    return deco


# A budget-capped external sweep records the first ~50 queries in
# registration order.  To keep every query's differential evidence fresh,
# the sweep order is explicit and least-recently-checked-first, decoupled
# from module import order.  Round-14 derivation (base order mechanical
# via tools/sweep_advisor over CORRECTNESS_r*.json; r13 was 50/50 green,
# the seventh consecutive fully-green driver round — no red rows, no
# never-checked queries before this round's registrations; evidence
# tiers now r11:47, r12:50, r13:50).  The 50-slot window:
#   slots 1-3: the three queries NEW this round, never driver-checked,
#     so they MUST sit in the window (test_never_checked_queries_lead
#     _the_window): llm_decontaminate_bloom (the fixed-size-bitset
#     scale path for llm_decontaminate, boolean-contract oracle),
#     llm_heavy_hitters (corpus-wide top-k bigrams, exact top-k
#     oracle), llm_reservoir_sample (weighted per-language reservoir
#     by deterministic integer priority).
#   slots 4-50: the full r11-evidence tier (47, alphabetical) — the
#     oldest remaining rows.  This tier includes llm_decontaminate,
#     which is ALSO code-recent this round (its gram builder moved
#     into the shared _doc_distinct_grams helper the bloom variant
#     reuses — behavior-identical, oracle untouched — and the fresh
#     differential re-proof is free since the row was already stale).
# 3 + 47 = 50 exactly — no oversubscription, no deferrals this round.
# Code-recency note: round 14 also added a runtime guard INSIDE
# llm_dedup_paragraph's argmin encoding (raise on seg_idx >= 2^20 or
# |doc_id| >= 2^43, ADVICE r13).  Its driver row is r13-fresh (last
# round's slot 50) and the guard is value-neutral for every in-range
# corpus (pinned both ways by tests/test_paragraph_dedup.py: in-range
# outputs unchanged at the 2^43-1 boundary, out-of-range raises), so
# it is NOT promoted — displacing an r11 row for it would trade a
# stale re-proof for a fresh one with ~0 differential info gain.
# tests/test_sweep_priority.py pins the invariants.
SWEEP_PRIORITY: list[str] = [
    # round-14 lead: the three new queries, never driver-checked
    "llm_decontaminate_bloom",
    "llm_heavy_hitters",
    "llm_reservoir_sample",
    # r11-evidence tier (all 47, alphabetical)
    "agg_approx_distinct",
    "agg_approx_quantiles",
    "agg_collect_sorted",
    "agg_count_distinct",
    "agg_cube",
    "agg_exact_quantiles",
    "agg_group_sum",
    "agg_grouping_sets",
    "agg_having",
    "agg_pivot",
    "agg_rollup",
    "agg_stats",
    "case_when_cast",
    "filter_in_like_regex",
    "filter_null_semantics",
    "flagship_revenue_by_nation",
    "join_anti",
    "join_broadcast_dim",
    "join_inner_equi",
    "join_left_outer",
    "join_multiway_star",
    "join_right_full",
    "join_self_dedup_pairs",
    "join_semi",
    "join_theta_range",
    "llm_corpus_stats",
    "llm_decontaminate",
    "llm_quality_repetition",
    "llm_tfidf_top_terms",
    "project_array_join",
    "project_flatten_json",
    "report_forecast_revenue_change",
    "report_local_supplier_volume",
    "report_market_share",
    "report_top_parts_per_brand",
    "scan_filter_prune",
    "set_union_all",
    "sink_partitioned_write",
    "sort_multi_key",
    "source_rest_datasource",
    "win_concurrency_sweep",
    "win_first_last",
    "win_ntile_percent",
    "win_range_frame",
    "win_rank_dense_rownum",
    "win_sliding_rows_frame",
    "win_topk_per_group",
    # ---- 50-slot window boundary ----
    # r12-evidence tier (50, alphabetical); the r13-evidenced queries
    # (freshest driver rows) fall to the implicit registration-order
    # tail below the explicit list
    "agg_mode_per_group",
    "agg_percentile_cont",
    "agg_salted_skew",
    "cdc_latest_per_key",
    "filter_conjunctive",
    "fn_timestamp_parse",
    "join_asof_latest",
    "join_asof_tolerance",
    "join_bnl_range_bands",
    "join_bucketed_colocated",
    "join_dpp_partitioned",
    "llm_containment_pairs",
    "llm_corpus_clean_pipeline",
    "llm_dedup_clusters",
    "llm_dedup_minhash",
    "llm_dedup_ngram_jaccard",
    "llm_dedup_semantic_clusters",
    "llm_embed_centroids",
    "llm_embed_knn_assign",
    "llm_fingerprint_rolling",
    "llm_pii_scrub",
    "llm_quality_entropy",
    "llm_sim_ivf_topk",
    "llm_sim_lsh_topk",
    "llm_sim_pairs_threshold",
    "llm_sim_topk",
    "mm_sample_frames",
    "mv_incremental_refresh",
    "project_rename_map",
    "report_funnel_steps",
    "report_large_volume_customers",
    "report_promo_revenue",
    "report_retention_cohorts",
    "report_sales_opportunity",
    "report_supplier_share",
    "report_waiting_suppliers",
    "scan_corrupt_quarantine",
    "scan_jsonl",
    "scan_schema_evolution",
    "sink_scd2_apply",
    "sink_sorted_write",
    "sink_time_travel",
    "source_paged_union",
    "stream_stream_interval_join",
    "stream_tumbling_topk",
    "ts_gapfill_locf",
    "win_consecutive_runs",
    "win_running_distinct",
    "win_running_sum",
    "win_sessionize_gaps",
]


def load_all_queries() -> None:
    """Import every query module, then apply the explicit sweep order."""
    # Imports are deferred so `import airflow_jira_etl_spark` stays cheap.
    from airflow_jira_etl_spark.queries import (  # noqa: F401
        scalar_functions,
        reports,
        sampling,
        streaming_queries,
        timeofday_queries,
        llm_ops,
        llm_extras,
        flagship,
        scans,
        projections,
        joins,
        aggregations,
        windows,
        sorts_sets,
        matview,
        cdc,
        embedding_ops,
    )

    missing = [n for n in SWEEP_PRIORITY if n not in QUERIES]
    if missing:  # typo guard — priority must reference real queries
        raise ValueError(f"SWEEP_PRIORITY names not registered: {missing}")
    prio = set(SWEEP_PRIORITY)
    ordered = SWEEP_PRIORITY + [n for n in QUERIES if n not in prio]
    for d in (QUERIES, ORACLES):
        tail = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(tail)
