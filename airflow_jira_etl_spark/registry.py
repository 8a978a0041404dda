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
# from module import order.  Round-11 derivation (base order mechanical
# via tools/sweep_advisor over CORRECTNESS_r*.json; r10 was 50/50 green,
# the fourth consecutive fully-green driver round, so there are no red
# rows and no never-checked queries).  The 50-slot window:
#   slot 1: set_union_all — the r10 round's one documented deferral
#     (r06 evidence, oldest in the registry).
#   slots 2-45: the r07-evidence tier (44 of its 46, alphabetical).
#   slots 46-50: FIVE code-recency promotions (the advisor cannot see
#     code changes): every ranking-family query — agg_exact_quantiles,
#     llm_corpus_stats, sort_multi_key, win_concurrency_sweep,
#     win_ntile_percent — because round 11 changed the family's
#     materialization from persist to localCheckpoint (lineage
#     truncation; fixes the reproducible silent-rank-corruption on
#     recompute after cache loss — operators/ranking.py module
#     docstring, tests/test_ranking_property.py cache-drop regression).
#     Their r10 rows predate that executed path.
#     (The same materialization swap inside ParquetUpsertTable.apply()
#     does NOT promote the upsert-backed queries: apply() is the write
#     path — their REGISTERED plans read the committed parquet back and
#     are byte-identical for deterministic batches; the dedicated
#     upsert test suite carries that evidence.)
# Oversubscription: 52 candidates (47 stale + 5 promotions) for 50
# slots -> 2 documented deferrals to round 12, chosen for weakest
# differential info gain:
#   filter_conjunctive — a bare AND-chain predicate; conjunctive
#     pushdown is exercised by scan_filter_prune and the null/IN/LIKE
#     filter siblings, all of which stay in-window.
#   project_rename_map — pure column aliasing through the same mapping
#     compiler as project_flatten_json (in-window); no predicate or
#     shuffle surface of its own.
# Both lead the post-window tail so they top the r12 order
# automatically.  tests/test_sweep_priority.py pins the invariants.
SWEEP_PRIORITY: list[str] = [
    # round-11 lead: the r10 deferral (r06 evidence, oldest row)
    "set_union_all",
    # r07-evidence tier (44 of 46, alphabetical; deferrals below)
    "agg_approx_distinct",
    "agg_approx_quantiles",
    "agg_collect_sorted",
    "agg_count_distinct",
    "agg_cube",
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
    "llm_decontaminate",
    "llm_dedup_semantic_clusters",
    "llm_quality_repetition",
    "llm_sim_ivf_topk",
    "llm_sim_pairs_threshold",
    "llm_tfidf_top_terms",
    "project_array_join",
    "project_flatten_json",
    "report_forecast_revenue_change",
    "report_local_supplier_volume",
    "report_market_share",
    "report_top_parts_per_brand",
    "scan_filter_prune",
    "sink_partitioned_write",
    "source_rest_datasource",
    "win_first_last",
    "win_range_frame",
    "win_rank_dense_rownum",
    "win_sliding_rows_frame",
    "win_topk_per_group",
    # code-recency promotions: all five ranking-family queries —
    # their materialization moved to localCheckpoint THIS round
    # (the silent-corruption fix), so their r10 rows predate the
    # executed path now registered
    "agg_exact_quantiles",
    "llm_corpus_stats",
    "sort_multi_key",
    "win_concurrency_sweep",
    "win_ntile_percent",
    # ---- 50-slot window boundary ----
    # the two documented r11 deferrals lead the round-12 tail
    "filter_conjunctive",
    "project_rename_map",
    # r09-evidence tier (alphabetical)
    "agg_mode_per_group",
    "agg_percentile_cont",
    "agg_salted_skew",
    "cdc_latest_per_key",
    "fn_bitwise_suite",
    "fn_hash_suite",
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
    "llm_embed_centroids",
    "llm_embed_knn_assign",
    "llm_fingerprint_rolling",
    "llm_pii_scrub",
    "llm_quality_entropy",
    "mm_resize_batch",
    "mm_sample_frames",
    "mv_incremental_refresh",
    "report_funnel_steps",
    "report_large_volume_customers",
    "report_monthly_growth",
    "report_promo_revenue",
    "report_retention_cohorts",
    "report_sales_opportunity",
    "report_supplier_share",
    "report_waiting_suppliers",
    "scan_corrupt_quarantine",
    "scan_csv",
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
    "win_lag_lead",
    "win_running_distinct",
    "win_running_sum",
    "win_sessionize_gaps",
    # r10-evidence tier (alphabetical, minus the 5 promotions)
    "agg_unpivot",
    "filter_exists_subquery",
    "filter_not_exists_subquery",
    "filter_scalar_subquery",
    "fn_array_suite",
    "fn_conditional_suite",
    "fn_date_suite",
    "fn_map_json_suite",
    "fn_math_suite",
    "fn_string_suite",
    "fn_time_of_day",
    "llm_corpus_sample",
    "llm_dedup_exact",
    "llm_dedup_simhash",
    "llm_lang_id",
    "llm_sim_lsh_topk",
    "llm_sim_topk",
    "llm_stratified_sample",
    "llm_text_quality",
    "llm_text_stats",
    "llm_text_tokens",
    "llm_token_count_bpe",
    "llm_train_val_test_split",
    "mm_decode_features",
    "report_returned_items",
    "report_shipping_priority",
    "scan_parquet",
    "set_except",
    "set_intersect",
    "set_union_distinct",
    "sink_create_table",
    "sink_upsert",
    "sort_limit_topk",
    "stream_dedup_keys",
    "stream_foreachbatch_upsert",
    "stream_session_window",
    "stream_sliding_avg",
    "stream_stateful_profile",
    "stream_static_enrich",
    "stream_tumbling_count",
    "stream_watermark_late",
    "udaf_grouped_agg",
    "udf_pandas_vectorized",
    "udf_python_scalar",
    "udtf_explode_kv",
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
