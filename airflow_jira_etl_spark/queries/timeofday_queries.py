"""TIME-of-day query — exercises the engine's TIME-gap convention
(functions/timeofday.py) end-to-end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.functions.timeofday import (
    seconds_to_time,
    time_of_day,
    time_to_seconds,
)
from airflow_jira_etl_spark.registry import query


@query(
    "fn_time_of_day",
    oracle="""
    WITH t AS (
        SELECT event_id,
               strftime(ts, '%H:%M:%S') AS start_time,
               CAST(hour(ts) * 3600 + minute(ts) * 60
                    + CAST(floor(second(ts)) AS INTEGER) AS INTEGER) AS seconds_of_day
        FROM events
    )
    SELECT event_id, start_time, seconds_of_day,
           lpad(CAST(seconds_of_day // 3600 AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST((seconds_of_day % 3600) // 60 AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST(seconds_of_day % 60 AS VARCHAR), 2, '0') AS time_roundtrip,
           CAST(seconds_of_day // 3600 AS INTEGER) AS hour_bucket
    FROM t
    """,
)
def fn_time_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The worklogs ``start_time`` TIME column re-expressed with the
    engine's convention: 'HH:mm:ss' canonical string ⇄ integer seconds
    since midnight, round-tripped exactly, plus the hour bucket a
    "billable hours by time-of-day" report groups on."""
    events = catalog.load(spark, sf_dir, "events")
    t = events.select(
        "event_id",
        time_of_day(F.col("ts")).alias("start_time"),
    ).withColumn("seconds_of_day", time_to_seconds(F.col("start_time")))
    return t.select(
        "event_id",
        "start_time",
        "seconds_of_day",
        seconds_to_time(F.col("seconds_of_day")).alias("time_roundtrip"),
        F.floor(F.col("seconds_of_day") / 3600).cast("int").alias("hour_bucket"),
    )
