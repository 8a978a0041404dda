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
# from module import order: first the queries with no sweep row in any
# round (r1/r2 artifacts), then the round-2 red row, then the 48 queries
# whose only green row is round 1.  The last ~6 of those spill past the
# 50-slot window and lead the next round's list.
SWEEP_PRIORITY: list[str] = [
    # never swept (registered past slot 50 in rounds 1-2)
    "mm_decode_features",
    "mm_sample_frames",
    "llm_dedup_semantic_clusters",
    "llm_tfidf_top_terms",
    "llm_quality_repetition",
    "llm_decontaminate",
    "llm_corpus_stats",
    # round-2 schema/hash failure, oracle fixed this round
    "fn_timestamp_parse",
    # round-1-only evidence, in round-1 artifact order
    "scan_parquet",
    "scan_filter_prune",
    "source_paged_union",
    "sink_upsert",
    "source_rest_datasource",
    "sink_partitioned_write",
    "sink_create_table",
    "project_flatten_json",
    "project_rename_map",
    "project_array_join",
    "filter_conjunctive",
    "filter_null_semantics",
    "filter_in_like_regex",
    "case_when_cast",
    "join_inner_equi",
    "join_broadcast_dim",
    "join_left_outer",
    "join_right_full",
    "join_semi",
    "join_anti",
    "join_theta_range",
    "join_multiway_star",
    "join_asof_latest",
    "join_self_dedup_pairs",
    "agg_group_sum",
    "agg_count_distinct",
    "agg_approx_distinct",
    "agg_having",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_stats",
    "agg_collect_sorted",
    "agg_pivot",
    "win_rank_dense_rownum",
    "win_topk_per_group",
    "win_running_sum",
    "win_sliding_rows_frame",
    "win_range_frame",
    "win_lag_lead",
    "win_ntile_percent",
    "win_first_last",
    "sort_multi_key",
    "sort_limit_topk",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
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
    )

    missing = [n for n in SWEEP_PRIORITY if n not in QUERIES]
    if missing:  # typo guard — priority must reference real queries
        raise ValueError(f"SWEEP_PRIORITY names not registered: {missing}")
    ordered = SWEEP_PRIORITY + [n for n in QUERIES if n not in set(SWEEP_PRIORITY)]
    for d in (QUERIES, ORACLES):
        tail = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(tail)
