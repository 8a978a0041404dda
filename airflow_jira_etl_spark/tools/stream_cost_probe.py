"""Streaming cost decomposition probe: separate the availableNow
micro-batch harness floor from each stateful operator's own increment.

Usage::

    python -m airflow_jira_etl_spark.tools.stream_cost_probe [sf_dir] [runs]

(default sf0.1, 2 runs — first run absorbs page staging + codegen; the
MIN across runs is the steady-state number reported, the standard
defense against this VM's documented ±50%+ host-load swings —
BASELINE.md records same-code solo-vs-loaded spreads up to 6×.)

The bench tail is dominated by the multi-batch streaming queries, and
VERDICT r07 attributed that to "availableNow micro-batch harness fixed
cost, not plan cost". This probe makes that claim falsifiable with a
controlled decomposition over the SAME 4 staged event pages, same
maxFilesPerTrigger=1, same scoped state partitions:

  floor      — a minimal JVM stateful aggregate (groupBy user_id
               count). Its wall is what ANY 4-batch stream costs on
               this host: per-batch planning, offset/commit log writes,
               state-store commits, memory-sink appends.
  <operator> — the real operator over the identical stream. Its wall
               minus the floor is the operator's true increment — the
               only part a plan change can reduce.

At cluster scale the floor amortizes (micro-batch planning is
per-BATCH, not per-row, and real deployments run continuous triggers
over far larger batches), while the increment scales with data — so
optimization effort belongs on increments, and the probe shows where
each query's wall actually sits. Reference semantics: the paged
micro-batch loop mirrors worklog_processor.py:80-106.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

from pyspark.sql import functions as F

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.session import get_spark
from airflow_jira_etl_spark.streaming.source import (
    pages_dir_for,
    scoped_shuffle_partitions,
    write_event_pages,
)


def _variants():
    from airflow_jira_etl_spark.streaming.stateful import (
        running_user_profile,
    )

    return {
        "floor": lambda s: s.groupBy("user_id").agg(
            F.count("*").alias("n")
        ),
        "pystate_profile": running_user_profile,
        "window_tumbling": lambda s: s.groupBy(
            F.window("ts", "1 hour"), "event_type"
        ).agg(F.count("*").alias("n")),
        "dedup_keys": lambda s: s.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .select("event_id", "user_id"),
    }


def run_probe(sf_dir: str, runs: int = 2, scratch: str | None = None) -> dict:
    """Returns {variant: steady_seconds}; prints one line per run."""
    from airflow_jira_etl_spark.queries.streaming_queries import SCRATCH

    from airflow_jira_etl_spark.scratch import session_scratch

    explicit_scratch = scratch
    scratch = scratch or SCRATCH
    spark = get_spark("stream-cost-probe")
    pages = pages_dir_for(scratch, sf_dir)
    write_event_pages(spark, sf_dir, pages, n_pages=4)
    # checkpoints are PER-SESSION scratch (pid-keyed + dead-session
    # reaped), never a fixed shared path: a fixed path rmtree'd at run
    # start would delete a CONCURRENT session's in-flight probe
    # checkpoint (the exact hazard scratch.py's docstring names), and
    # fixed leftovers matched no reaper. An explicitly-passed scratch
    # (the tests' tmp dir) keeps everything under the caller's dir.
    ck_root = (
        os.path.join(explicit_scratch, "checkpoints_cost_probe")
        if explicit_scratch
        else session_scratch("checkpoints", "cost_probe")
    )
    steady: dict[str, float] = {}
    for name, mk in _variants().items():
        for i in range(runs):
            ck = os.path.join(ck_root, f"{name}_{i}")
            shutil.rmtree(ck, ignore_errors=True)
            stream = (
                spark.readStream.schema(catalog.SCHEMAS["events"])
                .option("maxFilesPerTrigger", 1)
                .parquet(os.path.join(pages, "page_*"))
            )
            sink = f"cost_probe_{name}_{i}"
            with scoped_shuffle_partitions(spark):
                t0 = time.time()
                q = (
                    mk(stream)
                    .writeStream.outputMode("update")
                    .format("memory")
                    .queryName(sink)
                    .option("checkpointLocation", ck)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                wall = time.time() - t0
            n = spark.table(sink).count()
            print(f"{name} run{i}: {wall:.2f}s rows={n}", flush=True)
            steady[name] = min(steady.get(name, wall), round(wall, 2))
            spark.catalog.dropTempView(sink)
    floor = steady["floor"]
    for name, w in steady.items():
        if name != "floor":
            print(
                f"{name}: wall {w:.2f}s = floor {floor:.2f}s "
                f"+ increment {w - floor:.2f}s"
            )
    return steady


def run_foreachbatch_probe(sf_dir: str, runs: int = 2) -> dict:
    """Decompose stream_foreachbatch_upsert (the one hot streaming
    query without a cost split — VERDICT-r11 item 6) into its three
    phases over the SAME 4 staged pages the registered query streams:

      fb_floor    — the foreachBatch availableNow harness with a
                    count-only batch fn: per-batch planning, offset /
                    commit log writes, the batch DataFrame's own scan.
      fb_merge    — the real per-batch MERGE into the parquet upsert
                    table (range-bucketed copy-on-write); wall minus
                    fb_floor is the merge's true increment.
      maintenance — the post-stream compact + vacuum + read-back the
                    registered query performs once per run.

    Only the merge increment and maintenance are plan-addressable; the
    floor is what ANY 4-batch foreachBatch stream costs on this host."""
    from airflow_jira_etl_spark.scratch import session_scratch
    from airflow_jira_etl_spark.sinks.parquet_upsert import (
        ParquetUpsertTable,
        range_bucketer,
    )

    spark = get_spark("stream-cost-probe")
    scratch = session_scratch("stream_fb_probe")
    pages = pages_dir_for(scratch, sf_dir)
    page_size = write_event_pages(spark, sf_dir, pages, n_pages=4)
    ck_root = os.path.join(scratch, "ck")

    def stream_df():
        return (
            spark.readStream.schema(catalog.SCHEMAS["events"])
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(pages, "page_*"))
            .select("event_id", "user_id", "event_type", "value")
        )

    def run_stream(name: str, i: int, batch_fn) -> float:
        ck = os.path.join(ck_root, f"{name}_{i}")
        shutil.rmtree(ck, ignore_errors=True)
        with scoped_shuffle_partitions(spark):
            t0 = time.time()
            q = (
                stream_df()
                .writeStream.foreachBatch(batch_fn)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return time.time() - t0

    steady: dict[str, float] = {}
    for i in range(runs):
        w = run_stream("fb_floor", i, lambda df, bid: df.count())
        print(f"fb_floor run{i}: {w:.2f}s", flush=True)
        steady["fb_floor"] = min(steady.get("fb_floor", w), round(w, 2))

        table_dir = os.path.join(scratch, f"table_{i}")
        table = ParquetUpsertTable(
            spark,
            table_dir,
            key="event_id",
            bucketer=range_bucketer(max(page_size // 8, 1)),
        )
        table.destroy()
        w = run_stream("fb_merge", i, lambda df, bid: table.apply(df))
        print(f"fb_merge run{i}: {w:.2f}s", flush=True)
        steady["fb_merge"] = min(steady.get("fb_merge", w), round(w, 2))

        t0 = time.time()
        table.compact()
        table.vacuum(retain_last=1)
        n = table.read().count()
        w = time.time() - t0
        print(f"maintenance run{i}: {w:.2f}s rows={n}", flush=True)
        steady["maintenance"] = min(
            steady.get("maintenance", w), round(w, 2)
        )
        table.destroy()

    inc = steady["fb_merge"] - steady["fb_floor"]
    print(
        f"DECOMP fb_floor={steady['fb_floor']:.2f}s "
        f"merge_increment={inc:.2f}s "
        f"maintenance={steady['maintenance']:.2f}s "
        f"(query_total ≈ floor + increment + maintenance)"
    )
    return steady


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "foreachbatch":
        sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
        runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        run_foreachbatch_probe(sf, runs)
    else:
        sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
        runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
        run_probe(sf, runs)
