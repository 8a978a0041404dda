"""Custom Python DataSource: paginated REST as a first-class Spark source.

``spark.read.format("paged_rest")`` with:

* **offset-partition fan-out** — page 0 is fetched at planning time to
  learn ``total``/``maxResults`` (the reference's A3 capture,
  ``issue_processor.py:141-142``); every further offset becomes its own
  ``InputPartition``, so the scan parallelizes across executors instead
  of the reference's serial while-loop;
* **filter pushdown to the API** (SURVEY.md §4.2-1) — ``pushFilters``
  translates ``EqualTo`` predicates on declared parameter columns into
  API query params (the reference forwards ``projectId``/``issueId``
  the same way, ``fetch_jira_tempo_worklogs.py:60-63``), shrinking
  ``total`` — and therefore the partition count — at the source;
* **pluggable fetch** — the ``fetcher`` option is a dotted path to a
  factory ``(options) -> fetch(url, params)``; production wires an HTTP
  fetcher (sources/paged_rest.http_fetcher), tests a deterministic
  emulator (sources/fixture_fetchers).

Options:
  url           endpoint URL (required)
  fetcher       "pkg.module:factory" (required)
  schema_ddl    flat output schema, e.g. "id string, key string" —
                record fields are read by field name, missing -> NULL
  records_key   key holding the record list (default "issues")
  param_columns comma-separated columns eligible for pushdown
"""

from __future__ import annotations

import importlib
import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from airflow_jira_etl_spark.sources.paged_rest import with_retry


def _load_fetcher(spec: str, options: dict):
    mod_name, _, fn_name = spec.partition(":")
    factory = getattr(importlib.import_module(mod_name), fn_name)
    return factory(options)


class _OffsetPartition(InputPartition):
    def __init__(self, start_at: int, prefetched: list[dict] | None = None):
        self.start_at = start_at
        # page 0's records ride along from the planning fetch (pickled
        # into the partition) so the scan never fetches the same page
        # twice — one fewer API round trip per scan
        self.prefetched = prefetched


class PagedRestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = dict(options)
        self.url = options["url"]
        self.fetcher_spec = options["fetcher"]
        self.records_key = options.get("records_key", "issues")
        self.param_columns = [
            c for c in options.get("param_columns", "").split(",") if c
        ]
        self.api_params: dict[str, str] = {}

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:  # noqa: N802
        """Consume EqualTo filters on declared param columns; everything
        else is returned for Spark to evaluate post-scan."""
        remaining = []
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and len(f.attribute) == 1
                and f.attribute[0] in self.param_columns
                and isinstance(f.value, str)
            ):
                self.api_params[f.attribute[0]] = f.value
            else:
                remaining.append(f)
        return remaining

    def partitions(self) -> Sequence[InputPartition]:
        fetch = _load_fetcher(self.fetcher_spec, self.options)
        params = dict(self.api_params)
        params["startAt"] = 0
        first = with_retry(lambda: fetch(self.url, params))
        total = int(first.get("total", 0))
        stride = int(first.get("maxResults", 100)) or 100
        offsets = list(range(0, max(total, 1), stride))
        return [
            _OffsetPartition(
                o, prefetched=first.get(self.records_key, []) if o == 0 else None
            )
            for o in offsets
        ]

    def read(self, partition: _OffsetPartition):
        if partition.prefetched is not None:
            records = partition.prefetched
        else:
            fetch = _load_fetcher(self.fetcher_spec, self.options)
            params = dict(self.api_params)
            params["startAt"] = partition.start_at
            page = with_retry(lambda: fetch(self.url, params))
            records = page.get(self.records_key, [])
        names = self.schema.fieldNames()
        from pyspark.sql.types import StringType

        if not all(isinstance(f.dataType, StringType) for f in self.schema.fields):
            # generic fallback for non-string DDLs: row tuples
            for rec in records:
                yield tuple(
                    v if isinstance(v, str) or v is None else json.dumps(v)
                    for v in (rec.get(n) for n in names)
                )
            return
        # One Arrow batch per page instead of per-row tuple yields: the
        # harness then ships the whole page through one Arrow transfer
        # (tuple rows are individually pickled — the slow path once
        # pages are thousands of rows). All declared fields are strings
        # (non-string record values are JSON-encoded), matching the
        # string-typed DDL this source accepts.
        import pyarrow as pa

        cols = []
        for n in names:
            cols.append(
                pa.array(
                    [
                        v if isinstance(v, str) or v is None else json.dumps(v)
                        for v in (rec.get(n) for rec in records)
                    ],
                    pa.string(),
                )
            )
        yield pa.RecordBatch.from_arrays(cols, names=list(names))


class PagedRestStreamReader(SimpleDataSourceStreamReader):
    """The reference's cursor/offset page loop as an UNBOUNDED
    Structured Streaming source: each micro-batch reads the pages that
    appeared since the last committed offset, and the offset (the next
    ``startAt``) lives in the CHECKPOINT — exactly the resume-where-
    you-left-off state the reference keeps on ``self``
    (``worklog_processor.py:106``, ``issue_processor.py:103-104``), but
    crash-safe and replayable. Combined with the idempotent upsert sink
    this gives end-to-end exactly-once page ingestion.

    Page reads happen on the driver (SimpleDataSourceStreamReader
    contract) — appropriate here because a cursor API is inherently a
    serial, low-rate source; the heavy lifting (parse/flatten/merge)
    stays distributed downstream."""

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = dict(options)
        self.url = options["url"]
        self.fetcher_spec = options["fetcher"]
        self.records_key = options.get("records_key", "issues")
        self.max_pages_per_batch = int(options.get("max_pages_per_batch", 1))

    def initialOffset(self) -> dict:  # noqa: N802
        return {"startAt": 0}

    def _fetch_page(self, start_at: int) -> dict:
        fetch = _load_fetcher(self.fetcher_spec, self.options)
        params = {"startAt": start_at}
        return with_retry(lambda: fetch(self.url, params))

    def _rows(self, page: dict):
        names = self.schema.fieldNames()
        for rec in page.get(self.records_key, []):
            yield tuple(
                v if isinstance(v, str) or v is None else json.dumps(v)
                for v in (rec.get(n) for n in names)
            )

    def read(self, start: dict):
        start_at = int(start["startAt"])
        rows: list[tuple] = []
        for _ in range(self.max_pages_per_batch):
            page = self._fetch_page(start_at)
            total = int(page.get("total", 0))
            stride = int(page.get("maxResults", 100)) or 100
            if start_at >= total:
                break
            rows.extend(self._rows(page))
            start_at += stride
        return iter(rows), {"startAt": start_at}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        # deterministic replay for recovery: re-fetch the page range
        start_at = int(start["startAt"])
        end_at = int(end["startAt"])
        rows: list[tuple] = []
        while start_at < end_at:
            page = self._fetch_page(start_at)
            stride = int(page.get("maxResults", 100)) or 100
            rows.extend(self._rows(page))
            start_at += stride
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; the API holds no state


class PagedRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_rest"

    def schema(self) -> str:
        return self.options.get("schema_ddl", "id string, self string, key string")

    def reader(self, schema: StructType) -> PagedRestReader:
        return PagedRestReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> PagedRestStreamReader:  # noqa: N802
        return PagedRestStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(PagedRestDataSource)
