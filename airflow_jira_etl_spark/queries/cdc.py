"""Change-data-capture shapes: changelog compaction and SCD2 history.

The reference's whole pipeline is CDC-flavored — fetch changed Jira
issues since a cursor, upsert them over the previous state
(``/root/reference/dags/jira/db_ops.py:29-43``). These queries cover
the two canonical downstream shapes of that feed: compacting a
changelog to latest-state-per-key (with delete tombstones), and
preserving attribute history as an SCD Type 2 dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.functions.rounding import fround, sql_fround
from airflow_jira_etl_spark.registry import query


@query(
    "cdc_latest_per_key",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
               {sql_fround("value")} AS value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id,
           event_id AS last_event_id,
           ts AS last_ts,
           event_type AS last_event_type,
           value AS last_value
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction: events as a CDC stream keyed by user —
    the LATEST row per key wins, and a key whose latest row is a
    delete tombstone (``event_type = 'error'`` here) is dropped
    entirely.

    Implemented with ``max_by`` over a struct order key, NOT a window:
    a row_number window must shuffle every changelog row to its key's
    reducer, while max_by is an algebraic aggregate — each map task
    pre-combines down to one candidate row per key before the exchange
    (partial aggregation), so the shuffle carries |keys| rows, not
    |changelog| rows. On a 100 TB changelog with a hot key that is the
    difference between a straggler and an even stage. The tie-break is
    total (ts, then event_id), so the result is deterministic under
    any partitioning."""
    events = catalog.load(spark, sf_dir, "events")
    latest = (
        events.groupBy("user_id")
        .agg(
            F.expr(
                "max_by(struct(event_id, ts, event_type, value),"
                " struct(ts, event_id))"
            ).alias("last")
        )
        .select(
            "user_id",
            F.col("last.event_id").alias("last_event_id"),
            F.col("last.ts").alias("last_ts"),
            F.col("last.event_type").alias("last_event_type"),
            fround(F.col("last.value")).alias("last_value"),
        )
    )
    return latest.where(F.col("last_event_type") != "error")


@query(
    "sink_scd2_apply",
    oracle=f"""
    WITH base AS (
        SELECT c_custkey, c_mktsegment,
               {sql_fround("c_acctbal")} AS c_acctbal
        FROM customer
    )
    SELECT c_custkey, c_mktsegment, c_acctbal,
           DATE '2024-01-01' AS valid_from,
           DATE '2024-06-01' AS valid_to,
           false AS is_current
    FROM base WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey, 'MOVED-' || c_mktsegment AS c_mktsegment,
           {sql_fround("c_acctbal + 100.0")} AS c_acctbal,
           DATE '2024-06-01' AS valid_from,
           CAST(NULL AS DATE) AS valid_to,
           true AS is_current
    FROM base WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal,
           DATE '2024-01-01' AS valid_from,
           CAST(NULL AS DATE) AS valid_to,
           true AS is_current
    FROM base WHERE c_custkey % 7 <> 0
    """,
)
def sink_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 merge over the customer dimension: a change batch
    re-segments every 7th customer (attributes differ → old version
    closed at the effective date, new current version appended) and
    re-sends every 11th customer UNCHANGED (null-safe diff → no-op, no
    history fork — the oracle has no branch for them because the
    operator must leave no trace). The change batch broadcasts; the
    dimension is never shuffled (operators/scd2.py)."""
    from airflow_jira_etl_spark.operators.scd2 import scd2_merge

    customer = catalog.load(spark, sf_dir, "customer")
    base = customer.select(
        "c_custkey",
        "c_mktsegment",
        fround(F.col("c_acctbal")).alias("c_acctbal"),
    )
    dim0 = base.select(
        "*",
        F.lit("2024-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    moved = base.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.concat(F.lit("MOVED-"), F.col("c_mktsegment")).alias("c_mktsegment"),
        fround(F.col("c_acctbal") + 100.0).alias("c_acctbal"),
    )
    resent_unchanged = base.where(
        (F.col("c_custkey") % 11 == 3) & (F.col("c_custkey") % 7 != 0)
    )
    # materialize the batch ONCE: it derives from a dimension-sized
    # scan here, and scd2_merge references its deduped batch at three
    # plan sites, each re-deriving an unexchanged frame — without this
    # the executed plan carried SIX customer scans for the batch side
    # (scd2_merge's caller cost note; measured 8 total scans → 3)
    changes = moved.unionByName(resent_unchanged).localCheckpoint()
    return scd2_merge(
        dim0,
        changes,
        key="c_custkey",
        attrs=["c_mktsegment", "c_acctbal"],
        effective="2024-06-01",
    )
