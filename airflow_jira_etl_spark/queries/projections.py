"""Projection, flatten, filters, predicates — SURVEY.md §2B.

Provenance: reference A5 (mapping flatten), A6 (pruning), A7 (array
join); filter queries exercise the predicate surface the reference's
tables exist to serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.functions.rounding import fround
from airflow_jira_etl_spark.operators.mapping import flatten
from airflow_jira_etl_spark.registry import query


@query(
    "project_flatten_json",
    oracle="""
    SELECT event_id,
           event_type,
           -- json_valid gate (r12 JSON-drift armor): DuckDB's
           -- json_extract_string hard-errors on malformed JSON where
           -- Spark's from_json yields NULL
           CAST(json_extract_string(
                CASE WHEN json_valid(props) THEN props END,
                '$.k') AS INTEGER) AS props_k
    FROM events
    """,
)
def project_flatten_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core operator (A5): parse nested JSON and project
    paths to prefixed flat columns (``jira_base_processor.py:65-106``).
    ``from_json`` with an explicit schema, then the MAPPING compiler
    emits ``props_k`` exactly as the reference's recursive prefixing
    would (raw parent key + ``_`` + mapped leaf name)."""
    events = catalog.load(spark, sf_dir, "events")
    parsed = events.withColumn("props", F.from_json("props", "k INT"))
    mapping = {
        "event_id": "event_id",
        "event_type": "event_type",
        "props": {"k": "k"},  # flattens to props_k
    }
    return flatten(parsed, mapping)


@query(
    "project_rename_map",
    oracle="""
    SELECT c_custkey AS custkey,
           c_name AS name,
           c_nationkey AS nationkey,
           c_mktsegment AS segment
    FROM customer
    """,
)
def project_rename_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAPPING-driven bulk rename (A5's flat-key path: keep mapped keys,
    rename, drop the rest — ``jira_base_processor.py:88-104``). The
    un-mapped ``c_acctbal`` column disappears and Catalyst prunes it at
    the parquet scan."""
    customer = catalog.load(spark, sf_dir, "customer")
    mapping = {
        "c_custkey": "custkey",
        "c_name": "name",
        "c_nationkey": "nationkey",
        "c_mktsegment": "segment",
    }
    return flatten(customer, mapping)


@query(
    "project_array_join",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(string_split(text, ' ')), '//') AS tokens_joined
    FROM documents
    """,
)
def project_array_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array → '//'-delimited string (reference A7:
    ``'//'.join(map(str, value))``, ``jira_base_processor.py:98-100``).
    Sorted first so the delimited form is deterministic."""
    documents = catalog.load(spark, sf_dir, "documents")
    arr = F.sort_array(F.split(F.col("text"), " "))
    return documents.select(
        "doc_id",
        # concat_ws maps a NULL array to '' — NULL text must stay NULL
        # (the oracle's string_agg over zero rows), same guard as the
        # mapping compiler's array leaf
        F.when(arr.isNull(), F.lit(None))
        .otherwise(F.concat_ws("//", arr))
        .alias("tokens_joined"),
    )


@query(
    "filter_conjunctive",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24.0
    """,
)
def filter_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-predicate conjunctive filter (TPC-H Q6 shape). All three
    predicates push to the parquet scan as one conjunction."""
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    return lineitem.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice")


@query(
    "filter_null_semantics",
    oracle="""
    WITH t AS (
        SELECT o_orderkey,
               nullif(o_orderstatus, 'O') AS status_or_null,
               nullif(o_orderpriority, '1-URGENT') AS prio_or_null
        FROM orders
    )
    SELECT o_orderkey, status_or_null, prio_or_null,
           (status_or_null IS NULL) AS status_is_null,
           (status_or_null IS NOT DISTINCT FROM prio_or_null) AS null_safe_eq
    FROM t
    WHERE status_or_null IS NULL OR prio_or_null IS NOT NULL
    """,
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL / null-safe equality. The reference's rows
    routinely miss ``resolution``/``assignee`` (DDL nullable columns,
    ``fetch_jira_issues.py:75-86``; heterogeneous per-row INSERT columns,
    ``db_ops.py:33``) — NULL handling is first-class."""
    orders = catalog.load(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio_or_null"),
    )
    return t.select(
        "o_orderkey",
        "status_or_null",
        "prio_or_null",
        F.col("status_or_null").isNull().alias("status_is_null"),
        F.col("status_or_null").eqNullSafe(F.col("prio_or_null")).alias("null_safe_eq"),
    ).where(F.col("status_or_null").isNull() | F.col("prio_or_null").isNotNull())


@query(
    "filter_in_like_regex",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#7', 'Brand#13')
      AND p_name LIKE '%widget'
      AND regexp_matches(p_type, '^(ECONOMY|PROMO)')
    """,
)
def filter_in_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + LIKE suffix + regexp prefix match."""
    part = catalog.load(spark, sf_dir, "part")
    return part.where(
        F.col("p_brand").isin("Brand#1", "Brand#7", "Brand#13")
        & F.col("p_name").like("%widget")
        & F.col("p_type").rlike("^(ECONOMY|PROMO)")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@query(
    "case_when_cast",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'medium'
                ELSE 'large' END AS qty_bucket,
           -- non-finite -> NULL int on BOTH engines: Spark's ANSI
           -- double->int cast throws on NaN/Inf and DuckDB's CAST
           -- hard-errors too — a drifted fixture with one non-finite
           -- quantity would crash both sides (r12 non-finite sweep)
           CASE WHEN isfinite(l_quantity)
                THEN CAST(floor(l_quantity) AS INTEGER) END AS qty_int,
           round((l_extendedprice / 3600.0) + 1e-9, 4) AS price_per_hour_ish
    FROM lineitem
    """,
)
def case_when_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN buckets + casts (the seconds→hours shape implied by
    ``time_spent_seconds``, ``fetch_jira_tempo_worklogs.py:84``)."""
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
        .alias("qty_bucket"),
        # floor() pinned on both sides: a bare double->int CAST
        # truncates in Spark but rounds-to-nearest in DuckDB — a
        # fractional-quantity fixture regen would diverge on every row.
        # Non-finite -> NULL (both engines' raw casts CRASH on NaN/Inf:
        # Spark's ANSI cast and DuckDB's CAST both hard-error)
        F.when(
            ~(
                F.isnan("l_quantity")
                | F.col("l_quantity").isin(float("inf"), float("-inf"))
            ),
            F.floor(F.col("l_quantity")).cast("int"),
        ).alias("qty_int"),
        fround(F.col("l_extendedprice") / 3600.0).alias("price_per_hour_ish"),
    )
