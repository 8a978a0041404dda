"""Flagship pipeline: revenue by customer nation over time.

The direct analog of the reference's raison-d'être query — "billable
hours by author per project per day" over its worklogs↔issues↔users
star (join keys: ``/root/reference/dags/fetch_jira_tempo_worklogs.py:82,91``,
``fetch_jira_issues.py:72``, ``fetch_jira_users.py:75``) — expressed on
the fixture star schema: lineitem ⋈ orders ⋈ customer ⋈ nation with a
date-range filter, month bucketing, and a revenue aggregate.

Scale notes: the two fact-side joins (lineitem⋈orders, orders⋈customer)
shuffle on their keys and AQE picks sort-merge vs shuffled-hash at
runtime; nation (25 rows, fixed) is explicitly broadcast so the final
join never shuffles the fact stream. The date filter is pushed to the
parquet scan along with column pruning (only 7 of 22 scanned columns
survive the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.functions.rounding import fround
from airflow_jira_etl_spark.registry import query


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    orders = catalog.load(spark, sf_dir, "orders")
    customer = catalog.load(spark, sf_dir, "customer")
    nation = catalog.load(spark, sf_dir, "nation")

    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("n_name"),
            F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
        )
        .agg(
            fround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy("n_name", "order_month")
    )


FLAGSHIP_ORACLE = """
SELECT n_name,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '2000-01-01'
GROUP BY 1, 2
ORDER BY 1, 2
"""

# the flagship is itself part of the correctness gate
query("flagship_revenue_by_nation", oracle=FLAGSHIP_ORACLE)(flagship)
