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
