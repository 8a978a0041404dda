"""Sorts, limits, set ops — SURVEY.md §2B "Sorts, limits, set ops".

``set_union_all`` is the multi-page/multi-source extract union of the
reference's paginated scans (A2+A3); the rest complete the relational
set surface. Global sorts carry an explicit position column so the
ordering itself is asserted by the order-insensitive oracle compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.registry import query


@query(
    "sort_multi_key",
    oracle="""
    SELECT o_orderkey, o_orderstatus, status_or_null, o_totalprice,
           CAST(row_number() OVER (ORDER BY status_or_null DESC NULLS FIRST,
                                   o_totalprice DESC, o_orderkey) AS BIGINT) AS pos
    FROM (SELECT o_orderkey, o_orderstatus, o_totalprice,
                 nullif(o_orderstatus, 'O') AS status_or_null
          FROM orders)
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY with desc + NULLS FIRST. The oracle compare is
    order-insensitive, so the global rank is materialized as ``pos`` —
    the sort's correctness is in the values. The rank comes from the
    distributed two-phase ranker (operators/ranking.py: range shuffle +
    prefix-sum offsets), NOT an un-partitioned window — this runs on the
    full fact table, where a single-task WindowExec would serialize the
    whole input through one core."""
    from airflow_jira_etl_spark.operators.ranking import global_row_number

    orders = catalog.load(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
    )
    ranked, _ = global_row_number(
        t,
        [
            F.col("status_or_null").desc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        ],
        rn_col="pos",
    )
    return ranked.select(
        "o_orderkey",
        "o_orderstatus",
        "status_or_null",
        "o_totalprice",
        "pos",
    )


@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY + LIMIT lowers to TakeOrderedAndProject —
    each task keeps a k-row heap and only k rows ever reach the driver,
    the only top-k shape that works on 100 TB."""
    orders = catalog.load(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "set_union_all",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders WHERE o_totalprice > 400000.0
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two homogeneous extracts (the reference unions
    pages from multiple paginated scans — A2+A3; rows in both extracts
    appear twice, by design)."""
    orders = catalog.load(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(*cols)
    big = orders.where(F.col("o_totalprice") > 400000.0).select(*cols)
    return urgent.unionByName(big)


@query(
    "set_union_distinct",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders WHERE o_totalprice > 400000.0
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (distinct) — one hash-aggregate shuffle over the bag."""
    orders = catalog.load(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(*cols)
    big = orders.where(F.col("o_totalprice") > 400000.0).select(*cols)
    return urgent.unionByName(big).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): customers with both an urgent
    and a finished order."""
    orders = catalog.load(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference) — the "users never logging work"
    anti-set, multiplicity-aware."""
    orders = catalog.load(spark, sf_dir, "orders")
    a = orders.select("o_custkey")
    b = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.exceptAll(b)
