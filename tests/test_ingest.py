"""Ingest-layer tests: pagination protocols, retry policy, fan-out ≡
serial union, idempotent replay — the reference's operational
invariants (SURVEY.md §3.4) as properties."""

from __future__ import annotations

import json
import os

import pytest

from airflow_jira_etl_spark.entities import WORKLOG_MAPPING
from airflow_jira_etl_spark.sources.paged_rest import (
    cursor_scan,
    offset_scan_parallel,
    records_to_flat_df,
    single_page_scan,
    with_retry,
)

# ---- fixture fetchers (the three reference response shapes, FIXTURES.md §2)


def make_cursor_fetcher(n_pages: int = 3, page_size: int = 4):
    """Worklogs shape: {"results": [...], "metadata": {"next": url?}}."""

    def fetch(url: str, params=None):
        page_no = int(url.rsplit("page=", 1)[1]) if "page=" in url else 0
        records = [
            {"tempoWorklogId": str(page_no * page_size + i), "self": f"w{page_no}-{i}"}
            for i in range(page_size)
        ]
        meta = {}
        if page_no < n_pages - 1:
            meta["next"] = f"https://api/worklogs?page={page_no + 1}"
        return {"results": records, "metadata": meta}

    return fetch


def make_offset_fetcher(total: int = 23, stride: int = 5):
    """Issues shape: {"startAt": N, "maxResults": M, "total": T, "issues": [...]}."""

    def fetch(url: str, params=None):
        start = int((params or {}).get("startAt", 0))
        records = [
            {"id": str(i), "self": f"issue-{i}"}
            for i in range(start, min(start + stride, total))
        ]
        return {"startAt": start, "maxResults": stride, "total": total, "issues": records}

    return fetch


def test_cursor_scan_follows_chain_in_order():
    pages = list(cursor_scan(make_cursor_fetcher(), "https://api/worklogs?page=0"))
    assert len(pages) == 3
    ids = [r["tempoWorklogId"] for page in pages for r in page]
    assert ids == [str(i) for i in range(12)]


def test_single_page_scan_bare_list():
    fetch = lambda url, params=None: [{"accountId": "a"}, {"accountId": "b"}]  # noqa: E731
    assert len(single_page_scan(fetch, "https://api/users")) == 2


def test_retry_policy_recovers_and_gives_up():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("boom")
        return "ok"

    sleeps = []
    assert with_retry(flaky, sleep=sleeps.append) == "ok"
    assert calls["n"] == 3
    # exp backoff clamped to [4, 10] (the reference's tenacity config)
    assert all(4.0 <= s <= 10.0 for s in sleeps)

    def always_fails():
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        with_retry(always_fails, sleep=lambda s: None)


def test_offset_fanout_equals_serial_union(spark):
    """A3 parallel fan-out must produce exactly the rows a serial walk
    produces (order-insensitive)."""
    fetch = make_offset_fetcher(total=23, stride=5)
    df = offset_scan_parallel(spark, fetch, "https://api/search", records_key="issues")
    got = sorted(json.loads(r.raw)["id"] for r in df.collect())
    assert got == sorted(str(i) for i in range(23))


def test_offset_fanout_single_page(spark):
    fetch = make_offset_fetcher(total=3, stride=5)
    df = offset_scan_parallel(spark, fetch, "https://api/search", records_key="issues")
    assert df.count() == 3


def test_ingest_replay_is_idempotent(spark, tmp_path):
    """Re-ingesting the same pages through the upsert sink leaves the
    table unchanged — the invariant that makes the reference's
    retry/replay safe (SURVEY.md §3.4)."""
    from airflow_jira_etl_spark.sinks.parquet_upsert import ParquetUpsertTable

    pages = list(cursor_scan(make_cursor_fetcher(), "https://api/worklogs?page=0"))
    table = ParquetUpsertTable(
        spark, os.path.join(str(tmp_path), "t"), key="tempo_worklog_id"
    )
    mapping = {"tempoWorklogId": "tempo_worklog_id", "self": "url"}
    for page in pages:
        table.apply(records_to_flat_df(spark, page, mapping))
    first_state = sorted(map(tuple, table.read().collect()))
    # replay every page again (the reference's whole-scan retry)
    for page in pages:
        table.apply(records_to_flat_df(spark, page, mapping))
    assert sorted(map(tuple, table.read().collect())) == first_state
    assert len(first_state) == 12


def test_corrupt_quarantine_preserves_raw_lines(spark, sf_dir):
    """Every planted corrupt line must be captured INTACT (raw text in
    the _malformed column), and the clean/quarantine split must be
    exhaustive — no line silently dropped."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from airflow_jira_etl_spark import catalog, registry

    registry.load_all_queries()
    clean = registry.QUERIES["scan_corrupt_quarantine"](spark, sf_dir)
    n_clean = clean.count()
    total = catalog.load(spark, sf_dir, "events").count()
    n_planted = catalog.load(spark, sf_dir, "events").where(
        F.col("event_id") % 1000 == 17
    ).count()
    assert n_planted > 0
    assert n_clean == total - n_planted

    from airflow_jira_etl_spark.scratch import session_scratch

    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = session_scratch("events_corrupt", tag)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("_malformed", T.StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_malformed")
        .json(out_dir)
        # Spark disallows queries touching ONLY the corrupt column on a
        # raw scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); a quarantine
        # consumer caches the parsed batch and splits it from there
        .cache()
    )
    parsed.count()  # materialize the cache; the rule checks the raw scan
    quarantined = parsed.where(F.col("_malformed").isNotNull())
    rows = quarantined.collect()
    parsed.unpersist()
    assert len(rows) == n_planted
    # raw line survives verbatim for replay/debugging
    assert all(r._malformed.startswith('{"event_id": ') for r in rows)
    assert all(r._malformed.endswith(', "user_') for r in rows)
