"""End-to-end pipeline test: the reference's worklogs DAG shape
(create >> fetch >> upsert) against a fixture cursor API."""

from __future__ import annotations

import pytest

from airflow_jira_etl_spark.pipeline import Pipeline, worklog_pipeline
from tests.test_ingest import make_cursor_fetcher


def _worklog_fetcher(n_pages=3, page_size=4):
    base = make_cursor_fetcher(n_pages, page_size)

    def fetch(url, params=None):
        page = base(url, params)
        # enrich with the nested fields the WORKLOG_MAPPING expects
        for i, r in enumerate(page["results"]):
            r["issue"] = {"id": f"I{r['tempoWorklogId']}", "self": "u"}
            r["author"] = {"accountId": f"A{i}", "self": "u"}
        return page

    return fetch


def test_worklog_pipeline_end_to_end(spark, tmp_path):
    p = worklog_pipeline(
        spark, _worklog_fetcher(), "https://api/worklogs?page=0", str(tmp_path)
    )
    order = p.run({})
    assert order == ["ensure_table", "ingest_pages", "merge_upsert"]
    # run a fresh pipeline again (the Airflow retry-from-scratch path):
    # state must be unchanged (idempotent replay)
    ctx2: dict = {}
    worklog_pipeline(
        spark, _worklog_fetcher(), "https://api/worklogs?page=0", str(tmp_path)
    ).run(ctx2)
    table = ctx2["table"].read()
    assert table.count() == 12
    cols = set(table.columns)
    assert {"tempo_worklog_id", "issue_id", "author_id", "url"} <= cols


def test_pipeline_cycle_detection():
    p = Pipeline("bad")
    p.task("a", upstream=["b"])(lambda ctx: None)
    p.task("b", upstream=["a"])(lambda ctx: None)
    with pytest.raises(RuntimeError, match="cycle"):
        p.run({})


def test_dag_specs_mirror_reference_shape():
    """Three entity DAGs, @daily/catchup-off/1-retry-5-min defaults,
    ensure_table >> ingest dependency (the reference's DAG config at
    fetch_jira_tempo_worklogs.py:15-26,114)."""
    from airflow_jira_etl_spark.orchestration import build_airflow_dags, build_dag_specs

    specs = build_dag_specs()
    assert [s.dag_id for s in specs] == [
        "fetch_jira_tempo_worklogs",
        "fetch_jira_issues",
        "fetch_jira_users",
    ]
    for s in specs:
        assert (s.schedule, s.catchup, s.retries, s.retry_delay_minutes) == (
            "@daily",
            False,
            1,
            5,
        )
        deps = {t.task_id: t.upstream for t in s.tasks}
        assert deps["ingest_and_merge"] == ("ensure_table",)
    # airflow absent here: materialization degrades to []
    assert build_airflow_dags() == []


def test_issues_pipeline_offset_fanout(spark, tmp_path):
    from airflow_jira_etl_spark.pipeline import issues_pipeline
    from airflow_jira_etl_spark.sources import fixture_fetchers

    fetch = fixture_fetchers.synthetic_issues_fetcher({})
    ctx: dict = {}
    issues_pipeline(spark, fetch, "https://api/search", str(tmp_path)).run(ctx)
    table = ctx["table"].read()
    assert table.count() == fixture_fetchers.TOTAL
    assert "issue_id" in table.columns and "issue_key" in table.columns


def test_users_pipeline_single_page(spark, tmp_path):
    from airflow_jira_etl_spark.pipeline import users_pipeline

    def fetch(url, params=None):
        return [
            {"self": "u1", "accountId": "a1", "displayName": "Jane", "active": "true"},
            {"self": "u2", "accountId": "a2", "displayName": "Kai", "active": "false"},
        ]

    ctx: dict = {}
    users_pipeline(spark, fetch, "https://api/users", str(tmp_path)).run(ctx)
    table = ctx["table"].read()
    assert table.count() == 2
    assert {"account_id", "display_name", "url"} <= set(table.columns)
