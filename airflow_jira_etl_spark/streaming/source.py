"""Structured Streaming source over the events fixture.

The reference's only streaming notion is micro-batches of ≤100 rows
from paginated REST responses (``worklog_processor.py:80-106``,
``limit=100`` at ``fetch_jira_tempo_worklogs.py:31``). Here the same
shape is a file-source stream consumed with the ``availableNow``
trigger: bounded input, processed as micro-batches, exactly the
batch-equivalent semantics the DuckDB oracle can check.

For multi-batch pipelines (the foreachBatch upsert), the events table
is first split into page files (the reference's pages) and streamed
with ``maxFilesPerTrigger=1`` so each page arrives as its own
micro-batch — a faithful, testable stand-in for the cursor loop.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_jira_etl_spark.catalog import _EVENTS_RAW, table_path


_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
)


def _staged_events_dir(sf_dir: str) -> str:
    """The file stream source requires a DIRECTORY; stage the events
    parquet file into one via symlink (no copy)."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    d = os.path.join(_SCRATCH, "stream_src", tag)
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    src = table_path(sf_dir, "events")
    if not os.path.islink(link) or os.readlink(link) != src:
        try:
            os.remove(link)
        except FileNotFoundError:
            pass
        os.symlink(src, link)
    return d


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events table (nanos ts handled as in
    catalog.load)."""
    from airflow_jira_etl_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    raw = spark.readStream.schema(_EVENTS_RAW).parquet(_staged_events_dir(sf_dir))
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def write_event_pages(
    spark: SparkSession, sf_dir: str, out_dir: str, n_pages: int = 8
) -> int:
    """Materialize the events table as ordered page files (the
    reference's paginated responses). Page COUNT is fixed and page
    size scales with the table — each downstream micro-batch MERGE
    rewrites the table once, so total work is O(n_pages · n), not the
    O(n²/page_size) a fixed-size page would cost. Returns the page
    count."""
    from airflow_jira_etl_spark import catalog

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    events = catalog.load(spark, sf_dir, "events")
    total = events.agg(F.max("event_id")).collect()[0][0] + 1
    page_size = -(-total // n_pages)  # ceil
    for i in range(n_pages):
        page = events.where(
            (F.col("event_id") >= i * page_size)
            & (F.col("event_id") < (i + 1) * page_size)
        )
        # one file per page, named in order so maxFilesPerTrigger=1
        # replays the cursor sequence deterministically
        page.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"page_{i:05d}")
        )
    return n_pages


STREAM_STATE_PARTITIONS = "8"



def scoped_shuffle_partitions(spark, n: str = STREAM_STATE_PARTITIONS):
    """Stateful streaming shard count = shuffle partitions at query
    start, and every shard costs a state directory + task per
    micro-batch. Scope it to the state size (keys/windows — hundreds
    to thousands here), not CPU count. Delegates to the generic helper
    in session.py."""
    from airflow_jira_etl_spark.session import (
        scoped_shuffle_partitions as generic,
    )

    return generic(spark, n)


def run_available_now(stream_df: DataFrame, checkpoint: str, name: str) -> DataFrame:
    """Run a streaming DataFrame to completion with availableNow into a
    memory sink; return the result as a batch DataFrame."""
    shutil.rmtree(checkpoint, ignore_errors=True)
    spark = stream_df.sparkSession
    with scoped_shuffle_partitions(spark):
        q = (
            stream_df.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")
