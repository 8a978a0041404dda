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
# from module import order.  Round-12 derivation (base order mechanical
# via tools/sweep_advisor over CORRECTNESS_r*.json; r11 was 50/50 green,
# the fifth consecutive fully-green driver round — no red rows, no
# never-checked queries).  The 50-slot window:
#   slots 1-2: filter_conjunctive + project_rename_map — the two
#     documented r11 deferrals and the only queries whose latest driver
#     row is r07 (VERDICT-r11 item 2 names them the evidence tail).
#   slots 3-45: the r09-evidence tier (43 of its 49, alphabetical).
#   slots 46-50: FIVE code-recency promotions (the advisor cannot see
#     code changes): round 12 added a NaN rung to the shared cosine
#     guard ladder (functions/similarity.py — Spark propagated NaN
#     where DuckDB nulled; measured divergence) and a NaN-aware
#     indexable predicate to the IVF query; every out-of-window
#     similarity consumer needs a fresh driver row under the new
#     executed path: llm_sim_topk, llm_sim_lsh_topk (r10 rows),
#     llm_sim_pairs_threshold, llm_sim_ivf_topk,
#     llm_dedup_semantic_clusters (r11 rows). The in-window r09-tier
#     consumers (llm_embed_centroids/knn_assign, llm_containment_pairs
#     etc.) are covered without promotion.
# Oversubscription: 56 candidates for 50 slots -> 6 documented
# deferrals to round 13, chosen for weakest differential info gain
# (code unchanged since their green rows; each leaves a sibling of
# its family in-window):
#   fn_bitwise_suite — exact-integer scalar expressions, bit-identical
#     on both engines by construction, no predicate/shuffle surface;
#     fn_timestamp_parse (the scalar suite with real cross-engine
#     parse semantics to diverge on) keeps the family seat in-window.
#   fn_hash_suite — boolean-contract oracle over deterministic hash
#     fns, code unchanged since r09.
#   scan_csv — format-scan path unchanged since r09; scan_jsonl keeps
#     the text-format-parse seat in-window.
#   mm_resize_batch — multimodal Arrow-kernel plumbing unchanged,
#     dedicated pytest suite; mm_sample_frames stays in-window.
#   report_monthly_growth — plain SQL-mirror report, unchanged; eight
#     report siblings stay in-window.
#   win_lag_lead — simple offset-window forms, unchanged; four window
#     siblings stay in-window.
# They lead the post-window tail so they top the r13 order
# automatically.  Code-recency note: round 12 also rewrote the scd2
# merge body (explode one-pass form) — sink_scd2_apply is already
# in-window via the r09 tier, so no promotion is needed.
# tests/test_sweep_priority.py pins the invariants.
SWEEP_PRIORITY: list[str] = [
    # round-12 lead: the two r11 deferrals (r07 evidence, oldest rows)
    "filter_conjunctive",
    "project_rename_map",
    # r09-evidence tier (43 of 49, alphabetical; deferrals below)
    "agg_mode_per_group",
    "agg_percentile_cont",
    "agg_salted_skew",
    "cdc_latest_per_key",
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
    "mm_sample_frames",
    "mv_incremental_refresh",
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
    # code-recency promotions: the cosine guard ladder gained a
    # NaN rung this round — these five similarity consumers'
    # latest driver rows predate the executed path
    "llm_sim_topk",
    "llm_sim_lsh_topk",
    "llm_sim_pairs_threshold",
    "llm_sim_ivf_topk",
    "llm_dedup_semantic_clusters",
    # ---- 50-slot window boundary ----
    # the six documented r12 deferrals lead the round-13 tail
    "fn_bitwise_suite",
    "fn_hash_suite",
    "mm_resize_batch",
    "report_monthly_growth",
    "scan_csv",
    "win_lag_lead",
    # r10-evidence tier (alphabetical); the r11-evidenced queries
    # (freshest driver rows) fall to the implicit registration-order
    # tail below the explicit list
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
