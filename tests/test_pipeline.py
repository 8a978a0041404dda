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
