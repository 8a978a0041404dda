"""availableNow harness floor decomposition (r16).

Times ONE minimal single-batch streaming query (groupBy count over the
staged events dir — the same source every registered single-batch
streaming query reads) and prints, per run:

  wall          — start() .. awaitTermination() returned
  sum(batches)  — sum of triggerExecution durationMs over all batches
  harness gap   — wall - sum(batches): query start/stop machinery
  per-batch durationMs breakdown (latestOffset / getBatch /
  queryPlanning / walCommit / addBatch / commitOffsets / triggerExecution)

Usage::

    python -m airflow_jira_etl_spark.tools.stream_floor_probe \
        [sf_dir] [runs] [--pages]

``--pages`` streams the 4-page staged dir with maxFilesPerTrigger=1
(the multi-batch shape) instead of the single-batch staged events dir.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

from pyspark.sql import functions as F

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.scratch import session_scratch
from airflow_jira_etl_spark.session import get_spark
from airflow_jira_etl_spark.streaming.source import (
    pages_dir_for,
    read_events_stream,
    scoped_shuffle_partitions,
    write_event_pages,
)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    runs = int(args[1]) if len(args) > 1 else 3
    pages_mode = "--pages" in sys.argv

    spark = get_spark("stream-floor-probe")
    ck_root = session_scratch("checkpoints", "floor_probe")
    from airflow_jira_etl_spark.queries.streaming_queries import SCRATCH

    pages = pages_dir_for(SCRATCH, sf_dir)
    write_event_pages(spark, sf_dir, pages, n_pages=4)

    for i in range(runs):
        if pages_mode:
            stream = (
                spark.readStream.schema(catalog.SCHEMAS["events"])
                .option("maxFilesPerTrigger", 1)
                .parquet(os.path.join(pages, "page_*"))
            )
        else:
            stream = read_events_stream(spark, sf_dir)
        agg = stream.groupBy("user_id").agg(F.count("*").alias("n"))
        ck = os.path.join(ck_root, f"run_{i}")
        shutil.rmtree(ck, ignore_errors=True)
        name = f"floor_probe_{i}"
        with scoped_shuffle_partitions(spark):
            t0 = time.perf_counter()
            q = (
                agg.writeStream.outputMode("update")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.perf_counter() - t0
        progress = q.recentProgress
        total_batches = 0.0
        print(f"run {i}: wall {wall * 1000:.0f} ms, {len(progress)} batches")
        for p in progress:
            d = p["durationMs"]
            total_batches += d.get("triggerExecution", 0)
            print(
                "  batch",
                p["batchId"],
                {k: d[k] for k in sorted(d)},
            )
        print(
            f"  sum(triggerExecution) {total_batches:.0f} ms, "
            f"start/stop gap {wall * 1000 - total_batches:.0f} ms"
        )
        spark.catalog.dropTempView(name)
        shutil.rmtree(ck, ignore_errors=True)


if __name__ == "__main__":
    main()
