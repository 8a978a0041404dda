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
    """Register ``fn`` as query ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# A budget-capped external sweep records the first ~50 queries in
# registration order.  To keep every query's differential evidence fresh,
# the sweep order is explicit and least-recently-checked-first, decoupled
# from module import order.  Round-5 derivation (mechanical: latest
# CORRECTNESS_r*.json row per query, then code-change recency). The
# 50-slot window is exactly consumed by the three must-have classes:
#   41 never-driver-checked queries (35 added earlier in round 5 + the
#      decorrelation reports and embedding ops added later in the round)
#      — first evidence, pinned in-window by test_sweep_priority;
#    5 round-4 red rows (events ts-unit drift) — the unit-sniff fix
#      must be re-proved by the driver itself;
#    4 minhash-family queries whose hashing was rewritten late in
#      round 5 (codes-array gram pass, Rabin-Karp word shingles, 3×6
#      geometry) — highest-risk changed code.
# Displaced past the window: the 8 r02-evidence streaming queries,
# sink_create_table/mm_*/sink_upsert (green or rows-green r03/r04) and
# tiers B/C — all covered by the committed local sf0.01 sweep artifact
# and first in line for round 6.
# `python -m airflow_jira_etl_spark.tools.sweep_advisor` derives the
# evidence-based base order mechanically from CORRECTNESS_r*.json;
# tests/test_sweep_priority.py pins the never-checked/red-row window
# invariants.
SWEEP_PRIORITY: list[str] = [
    # never checked: NEW earlier this session — first evidence
    "cdc_latest_per_key",
    "sink_scd2_apply",
    "ts_gapfill_locf",
    "agg_salted_skew",
    "agg_approx_quantiles",
    "sink_sorted_write",
    "llm_containment_pairs",
    "scan_schema_evolution",
    "report_monthly_growth",
    "report_large_volume_customers",
    "win_concurrency_sweep",
    "mm_resize_batch",
    "fn_bitwise_suite",
    "join_asof_tolerance",
    "join_dpp_partitioned",
    "llm_corpus_clean_pipeline",
    "scan_corrupt_quarantine",
    "stream_tumbling_topk",
    "join_bnl_range_bands",
    "agg_percentile_cont",
    # r04 red rows — events ts unit fix must re-prove these
    "fn_timestamp_parse",
    "source_paged_union",
    "join_asof_latest",
    "win_running_sum",
    "win_lag_lead",
    # code rewritten late in round 5 (gram hashing + LSH geometry):
    # driver must independently re-prove the whole band family
    "llm_dedup_ngram_jaccard",
    "llm_fingerprint_rolling",
    "llm_dedup_minhash",
    "llm_dedup_clusters",
    # never checked: NEW earlier this session — first evidence
    "stream_stream_interval_join",
    "mv_incremental_refresh",
    "win_sessionize_gaps",
    "llm_pii_scrub",
    "report_funnel_steps",
    "report_retention_cohorts",
    "win_running_distinct",
    "agg_mode_per_group",
    "llm_quality_entropy",
    "sink_time_travel",
    "win_consecutive_runs",
    "join_bucketed_colocated",
    "fn_hash_suite",
    "scan_jsonl",
    "scan_csv",
    # never checked: NEW late in round 5 — first evidence
    "report_waiting_suppliers",
    "report_sales_opportunity",
    "report_supplier_share",
    "report_promo_revenue",
    "llm_embed_centroids",
    "llm_embed_knn_assign",
    # ---- 50-slot window boundary ----
    # streaming queries: page layout v2 + unit-sniffed stream source
    # landed early in round 5; r2-only evidence, locally sf0.01-green
    "stream_tumbling_count",
    "stream_sliding_avg",
    "stream_session_window",
    "stream_watermark_late",
    "stream_dedup_keys",
    "stream_stateful_profile",
    "stream_foreachbatch_upsert",
    "stream_static_enrich",
    "sink_create_table",  # first SQL oracle this round (was rows-only)
    # first SQL oracles this round (previous rows were rows-only)
    "mm_decode_features",
    "mm_sample_frames",
    # upsert sink — bucketer fingerprint (r4) + vacuum manifest
    # stripping (r5) touched the merge path
    "sink_upsert",
    # tier B: round-1-only evidence
    "sort_multi_key",
    "sort_limit_topk",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    # tier C: round-2-only evidence — scalar suites first (they share
    # the timestamp/formatting surface the fixture change stressed)
    "fn_string_suite",
    "fn_date_suite",
    "fn_math_suite",
    "fn_array_suite",
    "fn_map_json_suite",
    "fn_conditional_suite",
    "fn_time_of_day",
    "flagship_revenue_by_nation",
    "report_shipping_priority",
    "report_local_supplier_volume",
    "report_forecast_revenue_change",
    "report_top_parts_per_brand",
    "report_market_share",
    "report_returned_items",
    "filter_exists_subquery",
    "filter_not_exists_subquery",
    "filter_scalar_subquery",
    "agg_exact_quantiles",
    "agg_unpivot",
    "llm_corpus_sample",
    "llm_train_val_test_split",
    "llm_stratified_sample",
    "llm_dedup_exact",
    "llm_dedup_simhash",
    "llm_sim_topk",
    "llm_sim_pairs_threshold",
    "llm_text_tokens",
    "llm_text_stats",
    "llm_text_quality",
    "udf_python_scalar",
    "udf_pandas_vectorized",
    "udaf_grouped_agg",
    "udtf_explode_kv",
    "llm_lang_id",
    "llm_token_count_bpe",
    "llm_sim_lsh_topk",
    "llm_sim_ivf_topk",
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
    ordered = SWEEP_PRIORITY + [n for n in QUERIES if n not in set(SWEEP_PRIORITY)]
    for d in (QUERIES, ORACLES):
        tail = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(tail)
