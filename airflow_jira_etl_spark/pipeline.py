"""Pipeline orchestration — the reference's DAG layer (A14), engine-side.

The reference wires ``create_table >> fetch`` per entity in Airflow
(``/root/reference/dags/fetch_jira_tempo_worklogs.py:97-114``; defaults
:15-26). Production deployments keep Airflow and submit these as Spark
jobs (one ``SparkSubmitOperator`` per pipeline — the BASELINE.json
"spark_approach"); the engine itself only needs a thin, dependency-
ordered task runner so pipelines are testable without a scheduler.

A pipeline here = ordered tasks over a shared context:
  ensure_table >> ingest (paginated scan → flatten) >> merge (upsert)
which is exactly the reference's task graph, with the fetch/persist
loop replaced by the engine's distributed operators.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from airflow_jira_etl_spark.entities import WORKLOG_MAPPING
from airflow_jira_etl_spark.sinks.parquet_upsert import ParquetUpsertTable
from airflow_jira_etl_spark.sources.paged_rest import (
    Fetcher,
    cursor_scan,
    records_to_flat_df,
)


@dataclass
class Task:
    name: str
    fn: Callable[[dict], None]
    upstream: list[str] = field(default_factory=list)


class Pipeline:
    """Minimal dependency-ordered task runner (topological execution,
    fail-fast). Airflow's retry/schedule layer sits above this in
    production; correctness does not depend on it (idempotent tasks)."""

    def __init__(self, name: str):
        self.name = name
        self.tasks: dict[str, Task] = {}

    def task(self, name: str, upstream: list[str] | None = None):
        def deco(fn: Callable[[dict], None]):
            self.tasks[name] = Task(name, fn, upstream or [])
            return fn

        return deco

    def run(self, context: dict) -> list[str]:
        done: list[str] = []
        remaining = dict(self.tasks)
        while remaining:
            ready = [
                t for t in remaining.values() if all(u in done for u in t.upstream)
            ]
            if not ready:
                raise RuntimeError(
                    f"dependency cycle or missing upstream in {self.name}: "
                    f"{sorted(remaining)}"
                )
            for t in sorted(ready, key=lambda t: t.name):
                t.fn(context)
                done.append(t.name)
                del remaining[t.name]
        return done


def worklog_pipeline(
    spark: SparkSession,
    fetcher: Fetcher,
    initial_url: str,
    table_root: str,
) -> Pipeline:
    """The worklogs DAG re-expressed: ensure table >> paginated ingest
    >> keyed merge (unique key ``tempo_worklog_id``, mirroring the DDL's
    UNIQUE column at ``fetch_jira_tempo_worklogs.py:81``)."""
    p = Pipeline("fetch_jira_tempo_worklogs")

    @p.task("ensure_table")
    def ensure_table(ctx: dict) -> None:
        ctx["table"] = ParquetUpsertTable(
            spark, os.path.join(table_root, "worklogs"), key="tempo_worklog_id"
        )

    @p.task("ingest_pages", upstream=["ensure_table"])
    def ingest_pages(ctx: dict) -> None:
        pages = cursor_scan(fetcher, initial_url)
        batches: list[DataFrame] = [
            records_to_flat_df(spark, page, WORKLOG_MAPPING) for page in pages if page
        ]
        ctx["batches"] = batches

    @p.task("merge_upsert", upstream=["ingest_pages"])
    def merge_upsert(ctx: dict) -> None:
        for batch in ctx["batches"]:
            ctx["table"].apply(batch)

    return p
