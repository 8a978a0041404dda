"""Custom REST DataSource tests: parallel offset scan, schema-by-name
record extraction, filter pushdown shrinking the scan."""

from __future__ import annotations

import pytest

from airflow_jira_etl_spark.sources import fixture_fetchers
from airflow_jira_etl_spark.sources.rest_datasource import register

SCHEMA = "id string, self string, key string, priority string, project_id string"
OPTS = {
    "url": "https://api/search",
    "fetcher": "airflow_jira_etl_spark.sources.fixture_fetchers:synthetic_issues_fetcher",
    "schema_ddl": SCHEMA,
    "records_key": "issues",
    "param_columns": "priority,project_id",
}


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _read(spark):
    return spark.read.format("paged_rest").options(**OPTS).load()


def test_full_scan_all_pages(spark):
    df = _read(spark)
    assert df.count() == fixture_fetchers.TOTAL
    ids = sorted(int(r.id) for r in df.collect())
    assert ids == list(range(fixture_fetchers.TOTAL))
    # fan-out: one partition per offset page
    assert df.rdd.getNumPartitions() == -(-fixture_fetchers.TOTAL // fixture_fetchers.STRIDE)


def test_missing_fields_are_null(spark):
    df = _read(spark)
    row = df.collect()[0]
    assert row.key.startswith("PROJ-")
    assert row.self.startswith("https://")


def test_filter_pushdown_to_api_params(spark):
    df = _read(spark).where("priority = 'high'")
    rows = df.collect()
    # the synthetic server filters server-side: 'high' = even ids
    assert len(rows) == -(-fixture_fetchers.TOTAL // 2)
    assert all(int(r.id) % 2 == 0 for r in rows)
    # pushdown shrinks total -> fewer offset partitions than full scan
    assert df.rdd.getNumPartitions() < -(-fixture_fetchers.TOTAL // fixture_fetchers.STRIDE)


def test_residual_filter_still_applied(spark):
    # LIKE is not pushable -> Spark evaluates it post-scan
    df = _read(spark).where("priority = 'low'").where("key LIKE 'PROJ-1%'")
    assert all(r.key.startswith("PROJ-1") and r.priority == "low" for r in df.collect())


def test_streaming_source_resumes_from_checkpoint(spark, tmp_path):
    """The cursor loop as a streaming source: each availableNow run
    ingests the pages one read() reports, the next ``startAt`` offset
    lives in the CHECKPOINT, and every restart resumes exactly where
    the previous run stopped — the reference's mid-scan resume
    (cursor kept on ``self``, worklog_processor.py:106) made
    crash-safe. Repeated restarts drain the API with no duplicates
    and no gaps."""
    opts = dict(OPTS, max_pages_per_batch="2")
    out = spark.readStream.format("paged_rest").options(**opts).load()
    ck = str(tmp_path / "ck")
    sink = str(tmp_path / "sink")

    n_runs = 0
    for _ in range(12):
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_runs += 1
        ids = [int(r.id) for r in spark.read.parquet(sink).collect()]
        if len(ids) >= fixture_fetchers.TOTAL:
            break
    assert sorted(ids) == list(range(fixture_fetchers.TOTAL))  # no dups, no gaps
    # it genuinely took multiple restarts (2 pages = 50 records per run)
    assert n_runs >= 3
