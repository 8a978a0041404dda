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
# from module import order.  Round-13 derivation (base order mechanical
# via tools/sweep_advisor over CORRECTNESS_r*.json; r12 was 50/50 green,
# the sixth consecutive fully-green driver round — no red rows, no
# never-checked queries; evidence tiers now r09:6, r10:43, r11:47,
# r12:50).  The 50-slot window:
#   slots 1-6: the six r12 deferrals — the only r09-evidence rows left.
#     NOTE (VERDICT/ADVICE r12): the r12 deferral rationale for
#     report_monthly_growth and win_lag_lead ("code unchanged") was
#     imprecise — their oracles gained NULLS FIRST in that very diff,
#     so their driver evidence predated their contracts for one round
#     (covered locally by test_value_drift_sweep in the interim). Both
#     lead the window now; report_monthly_growth is ALSO code-recent
#     this round (NULL-month chain split + window partitioned on
#     month IS NULL, dodging the DuckDB 1.0.0 NULL-group race — see
#     queries/reports.py and tests/test_value_drift_sweep.py).
#   slots 7-49: the full r10-evidence tier (43, alphabetical).
#   slot 50: llm_dedup_paragraph — NEW this round (paragraph-level
#     dedup, the Dolma/RefinedWeb shape), never driver-checked, so it
#     MUST sit in the window (test_never_checked_queries_lead_the
#     _window). It takes the slot that an earlier draft gave a
#     sink_scd2_apply code-recency promotion; that promotion is
#     DEMOTED with cause: the r13 scd2 change rebinds the effective
#     literal to the parsed date, which is value-identical for the
#     ISO input the registered query always passes — differential
#     info gain ~0, and the new-format paths are pinned by
#     tests/test_scd2.py locally.
# 6 + 43 + 1 = 50 exactly — no oversubscription, no deferrals this
# round.  Code-recency note: round 13 also added an upfront
# mode-mismatch gate to ParquetUpsertTable.apply (non-combining apply
# on a null_keys='group' table now refuses before planning); the gate
# is a new REFUSAL path — mv_incremental_refresh (combining, r12-green)
# and stream_foreachbatch_upsert (default 'reject' table, in-window
# via the r10 tier) execute only its condition check, and the refusal
# itself is pinned by tests/test_upsert_table.py.
# tests/test_sweep_priority.py pins the invariants.
SWEEP_PRIORITY: list[str] = [
    # round-13 lead: the six r12 deferrals (r09 rows, oldest evidence)
    "fn_bitwise_suite",
    "fn_hash_suite",
    "mm_resize_batch",
    "report_monthly_growth",
    "scan_csv",
    "win_lag_lead",
    # r10-evidence tier (all 43, alphabetical)
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
    # new this round, never driver-checked — must gain first evidence
    "llm_dedup_paragraph",
    # ---- 50-slot window boundary ----
    # r11-evidence tier (alphabetical); the r12-evidenced queries
    # (freshest driver rows) fall to the implicit registration-order
    # tail below the explicit list
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
