"""Dialect upsert-SQL generator tests (reference A8-A10/A12 parity).

The placeholder-count property is the regression the reference's MSSQL
version fails (2n placeholders for n values, db_ops.py:92,97)."""

from __future__ import annotations

import pytest

from airflow_jira_etl_spark.sinks.jdbc_dialects import (
    mssql_upsert_sql,
    mysql_upsert_sql,
    postgres_upsert_sql,
    upsert_sql,
)

COLS = ["tempo_worklog_id", "url", "time_spent_seconds"]
KEY = "tempo_worklog_id"


def test_postgres_shape():
    sql = postgres_upsert_sql("af_jira_worklogs", COLS, KEY)
    assert sql.count("%s") == len(COLS)
    assert "ON CONFLICT (tempo_worklog_id) DO UPDATE" in sql
    assert "url = EXCLUDED.url" in sql
    assert f"{KEY} = EXCLUDED" not in sql  # key never self-assigned


def test_mysql_shape():
    sql = mysql_upsert_sql("af_jira_worklogs", COLS, KEY)
    assert sql.count("%s") == len(COLS)
    assert "ON DUPLICATE KEY UPDATE" in sql
    assert "url = VALUES(url)" in sql


def test_mssql_binds_exactly_n_placeholders():
    sql = mssql_upsert_sql("af_jira_worklogs", COLS, KEY)
    # the fixed property: one placeholder per column, total — the
    # reference emits 2n (update branch + insert branch)
    assert sql.count("%s") == len(COLS)
    assert "MERGE INTO af_jira_worklogs AS target" in sql
    assert "WHEN MATCHED THEN UPDATE SET" in sql
    assert "WHEN NOT MATCHED THEN INSERT" in sql
    assert "src.url" in sql


def test_factory_routes_conn_id_prefixes():
    assert "ON CONFLICT" in upsert_sql("postgres_default", "t", COLS, KEY)
    assert "DUPLICATE KEY" in upsert_sql("mysql_prod", "t", COLS, KEY)
    assert "MERGE INTO" in upsert_sql("mssql_dw", "t", COLS, KEY)
    with pytest.raises(ValueError, match="unsupported dialect"):
        upsert_sql("oracle_default", "t", COLS, KEY)
