"""MAPPING-compiler golden tests — the edge semantics of the
reference's ``map_response_to_database_format``
(``/root/reference/dags/jira/jira_base_processor.py:65-106``):
unmapped keys dropped, nested prefixing from RAW parent keys, list →
'//'-join, missing keys → NULL."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from airflow_jira_etl_spark.entities import USER_MAPPING, WORKLOG_MAPPING
from airflow_jira_etl_spark.operators.mapping import mapping_to_schema
from airflow_jira_etl_spark.sources.paged_rest import records_to_flat_df

WORKLOG_RECORD = {
    "self": "https://api.tempo.io/worklogs/1",
    "tempoWorklogId": "101",
    "issue": {"id": "9001", "self": "https://jira/issue/9001"},
    "timeSpentSeconds": "3600",
    "billableSeconds": "1800",
    "startDate": "2024-01-05",
    "startTime": "09:30:00",
    "description": "work",
    "createdAt": "2024-01-05T10:00:00Z",
    "updatedAt": "2024-01-05T11:00:00Z",
    "author": {"accountId": "u1", "self": "https://jira/user/u1"},
    "UNMAPPED_FIELD": "must be dropped",
}


def test_worklog_flatten_golden(spark):
    df = records_to_flat_df(spark, [WORKLOG_RECORD], WORKLOG_MAPPING)
    row = df.collect()[0].asDict()
    assert row == {
        "url": "https://api.tempo.io/worklogs/1",
        "tempo_worklog_id": "101",
        "issue_id": "9001",  # raw parent key 'issue' + mapped leaf 'id'
        "issue_url": "https://jira/issue/9001",
        "time_spent_seconds": "3600",
        "billable_seconds": "1800",
        "start_date": "2024-01-05",
        "start_time": "09:30:00",
        "description": "work",
        "created_at": "2024-01-05T10:00:00Z",
        "updated_at": "2024-01-05T11:00:00Z",
        "author_id": "u1",
        "author_url": "https://jira/user/u1",
    }
    assert "UNMAPPED_FIELD" not in df.columns


def test_missing_nested_branch_yields_nulls(spark):
    rec = {k: v for k, v in WORKLOG_RECORD.items() if k not in ("author", "description")}
    row = records_to_flat_df(spark, [rec], WORKLOG_MAPPING).collect()[0].asDict()
    assert row["author_id"] is None
    assert row["author_url"] is None
    assert row["description"] is None


def test_list_join_and_map_key_selection(spark):
    rec = {
        "self": "u",
        "accountId": "a1",
        "accountType": "atlassian",
        "avatarUrls": {"48x48": "https://avatar/48", "24x24": "dropped"},
        "displayName": "Jane",
        "active": "true",
    }
    row = records_to_flat_df(spark, [rec], USER_MAPPING).collect()[0].asDict()
    # dynamic-key map: only the mapped '48x48' key survives, with the
    # raw parent prefix (users_processor.py:17-19)
    assert row["avatarUrls_avatar_url"] == "https://avatar/48"
    assert "24x24" not in str(row)


def test_array_joined_with_separator(spark):
    mapping = {"id": "id", "labels": "labels"}
    leaf_types = {"labels": T.ArrayType(T.StringType())}
    rec = {"id": "1", "labels": ["alpha", "beta", "gamma"]}
    df = records_to_flat_df(spark, [rec], mapping, leaf_types)
    assert df.collect()[0].labels == "alpha//beta//gamma"


def test_two_level_nesting_prefix(spark):
    mapping = {"fields": {"status": {"statusCategory": {"name": "name"}}}}
    rec = {"fields": {"status": {"statusCategory": {"name": "Done"}}}}
    df = records_to_flat_df(spark, [rec], mapping)
    # prefix chain = raw keys joined by '_' (jira_base_processor.py:95)
    assert df.columns == ["fields_status_statusCategory_name"]
    assert df.collect()[0][0] == "Done"


def test_mapping_to_schema_roundtrip(spark):
    schema = mapping_to_schema(WORKLOG_MAPPING)
    parsed = json.loads(schema.json())
    names = [f["name"] for f in parsed["fields"]]
    assert "issue" in names and "author" in names


def test_nested_mapping_over_non_struct_yields_nulls(spark):
    """API shape drift: the data carries a scalar where the mapping
    expects a nested dict. The reference requires isinstance(value,
    dict) and otherwise SKIPS the key (jira_base_processor.py:94-96) —
    SQL NULLs, never a crash on `a.b` over a non-struct column."""
    from airflow_jira_etl_spark.operators.mapping import flatten

    df = spark.createDataFrame(
        [("gone", "k1")], "author string, key string"
    )
    out = flatten(df, {"author": {"accountId": "id"}, "key": "issue_key"})
    row = out.collect()[0]
    assert row.author_id is None and row.issue_key == "k1"


def test_array_join_renders_null_elements_as_None(spark):
    """The reference's '//'.join(map(str, value)) renders a null
    element as 'None' — concat_ws alone would silently DROP it, losing
    element positions and count."""
    from airflow_jira_etl_spark.operators.mapping import flatten

    df = spark.createDataFrame(
        [(["a", None, "b"],), (None,)], "labels array<string>"
    )
    out = flatten(df, {"labels": "labels_joined"})
    got = [r.labels_joined for r in out.collect()]
    assert got == ["a//None//b", None]


def test_mapping_keys_with_dots_resolve_as_one_field(spark):
    """Raw API keys are arbitrary strings: a key containing '.' must
    resolve as ONE column, not be misparsed as extra nesting."""
    from airflow_jira_etl_spark.operators.mapping import flatten

    df = spark.createDataFrame([("s1", "x")], "`sprint.name` string, other string")
    out = flatten(df, {"sprint.name": "sprint"})
    assert out.collect()[0].sprint == "s1"


def test_duplicate_flat_output_names_rejected(spark):
    """Two leaves resolving to one flat name would emit two
    identically-aliased columns (AMBIGUOUS_REFERENCE on any later
    select, 'Found duplicate column(s)' on a parquet write — both far
    from the misconfigured mapping). The reference's dict interpreter
    silently keeps the LAST leaf (jira_base_processor.py:96); raising
    up front is the deliberate divergence."""
    import pytest

    from airflow_jira_etl_spark.operators.mapping import flatten

    df = spark.createDataFrame([("a", "b")], "id string, key string")
    with pytest.raises(ValueError, match="same flat column"):
        flatten(df, {"id": "id", "key": "id"})
    # same-NAME leaves under different parents flatten to distinct
    # prefixed names — legal, must not trip the guard
    nested = spark.sql(
        "SELECT 'x' AS id, named_struct('id', 'y') AS fields"
    )
    out = flatten(nested, {"id": "id", "fields": {"id": "fid"}})
    assert sorted(out.columns) == ["fields_fid", "id"]
