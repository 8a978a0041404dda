"""Paginated REST ingest — the reference's source operators, Spark-first.

Reference behavior being reproduced (SURVEY.md §2A):

* A1 HTTP fetch with Bearer/Basic auth from env
  (``/root/reference/dags/jira/jira_fetcher.py:19-37``, env lookup :14-16)
* A2 cursor-paginated scan: follow ``metadata.next`` until absent
  (``worklog_processor.py:80-108``) — inherently SERIAL (each cursor
  comes from the previous response); the Spark design keeps the cursor
  walk on the driver as a lightweight page iterator and parallelizes
  everything downstream (parse → flatten → sink).
* A3 offset-paginated scan: page 0 discovers ``total``
  (``issue_processor.py:141-142``), then every offset is independent —
  the scan FANS OUT across executors via ``spark.range(n_pages)`` +
  ``mapInPandas``, the key scan-parallelism win over the reference's
  serial loop. (The reference's ``<=`` off-by-one that refetches a
  trailing empty page, :129, is deliberately not reproduced.)
* A4 single-page scan (``users_processor.py:53-95``) = offset scan
  with one page.
* A13 retry: 5 attempts, exponential backoff 4-10 s
  (``jira_base_processor.py:14-17``) — per-page here (not whole-scan:
  retrying the whole scan is the reference's compromise because its
  cursor state lives on ``self``; per-page retry + idempotent upsert
  is strictly safer).

Pages are exchanged as RAW JSON STRINGS: executors parse them with
``from_json`` against an explicit schema derived from the MAPPING
(``mapping_to_schema``) and flatten with the compiled MAPPING plan —
all JVM-side after the fetch.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airflow_jira_etl_spark.operators.mapping import (
    Mapping,
    compile_mapping,
    mapping_to_schema,
)

# fetch(url, params) -> parsed JSON (dict or list)
Fetcher = Callable[[str, dict | None], object]

RETRY_ATTEMPTS = 5
RETRY_MIN_S = 4.0
RETRY_MAX_S = 10.0


def with_retry(
    fn: Callable[[], object],
    attempts: int = RETRY_ATTEMPTS,
    min_wait: float = RETRY_MIN_S,
    max_wait: float = RETRY_MAX_S,
    sleep: Callable[[float], None] = time.sleep,
) -> object:
    """The reference's tenacity policy (5 attempts, exp backoff 4-10 s,
    multiplier 1 — ``jira_base_processor.py:14-17``) without the
    dependency."""
    last: Exception | None = None
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — policy mirrors tenacity's default
            last = exc
            if attempt < attempts - 1:
                sleep(min(max_wait, max(min_wait, 2.0**attempt)))
    raise last  # type: ignore[misc]


def page_plan(page: dict) -> tuple[int | None, int]:
    """The offset-pagination facts of one response: (total, stride).
    ``total`` is None when the endpoint does not report one (the A4
    single-page shape) — callers must not conflate that with an empty
    result set. ONE parse shared by every offset scanner (batch
    DataSource, stream reader, the fan-out scan below); the total=0
    guard diverged between two hand-rolled copies once already."""
    total = page.get("total")
    stride = int(page.get("maxResults", 100) or 100)
    if stride <= 0:
        # e.g. the common 'maxResults: -1 = unlimited' convention —
        # as a range() step it silently yields ZERO offset partitions
        # (the whole scan, prefetched page 0 included, returns 0 rows)
        # or an empty parallel fan-out; no caller can paginate on a
        # non-positive stride, so the ONE shared parse refuses it
        raise ValueError(
            f"paged response reports non-positive maxResults {stride} "
            f"— cannot derive a pagination stride (an 'unlimited' "
            f"sentinel? fetch with an explicit maxResults param)"
        )
    return (int(total) if total is not None else None, stride)


def http_fetcher(auth_scheme: str, token_env: str) -> Fetcher:
    """A1: GET url+params with an auth header, parse JSON, raise on
    HTTP error. ``requests`` is optional in this environment — the
    fetcher is constructed lazily and fails with a clear message if the
    HTTP stack is unavailable (tests inject file-based fetchers)."""
    token = os.environ.get(token_env, "")

    def fetch(url: str, params: dict | None = None) -> object:
        try:
            import requests  # noqa: PLC0415 — optional dependency
        except ImportError as exc:  # pragma: no cover
            raise RuntimeError(
                "the 'requests' package is not installed; inject a custom "
                "fetcher (any callable (url, params) -> parsed JSON)"
            ) from exc
        resp = requests.get(
            url,
            params=params,
            headers={"Authorization": f"{auth_scheme} {token}"},
            timeout=30,
        )
        resp.raise_for_status()
        return resp.json()

    return fetch


def http_fetcher_factory(options: dict) -> Fetcher:
    """Factory with the custom-DataSource ``(options) -> fetch`` shape
    (rest_datasource's ``fetcher`` option is a dotted path to one of
    these): reads ``auth_scheme``/``token_env`` from the source options
    with the reference's defaults (Bearer auth, token from env —
    jira_fetcher.py:14-16)."""
    return http_fetcher(
        options.get("auth_scheme", "Bearer"),
        options.get("token_env", "API_TOKEN"),
    )


# --------------------------------------------------------------- scans

def cursor_scan(
    fetcher: Fetcher,
    initial_url: str,
    params: dict | None = None,
    results_key: str = "results",
    next_path: tuple[str, str] = ("metadata", "next"),
) -> Iterator[list[dict]]:
    """A2: yield record pages following the response cursor until it is
    absent (``worklog_processor.py:80-108``; cursor advance :106).
    Each page fetch is retried independently."""
    url: str | None = initial_url
    first = True
    while url:
        page = with_retry(lambda u=url: fetcher(u, params if first else None))
        first = False
        yield page.get(results_key, [])  # type: ignore[union-attr]
        meta = page.get(next_path[0], {})  # type: ignore[union-attr]
        url = meta.get(next_path[1]) if isinstance(meta, dict) else None


def offset_scan_parallel(
    spark: SparkSession,
    fetcher: Fetcher,
    url: str,
    params: dict | None = None,
    records_key: str = "issues",
    page_parallelism: int = 32,
) -> DataFrame:
    """A3 fan-out: fetch page 0 on the driver to learn ``total`` and
    the server's ``maxResults`` stride, then fetch the remaining
    offsets IN PARALLEL on executors (one task per page via
    ``spark.range``), returning a DataFrame of raw JSON record strings.

    At 100 TB-scale ingest the fetch cost dominates; this turns an
    O(pages) serial wall-clock into O(pages / executors)."""
    if params and "startAt" in params:
        # the offset range below assumes coverage begins at 0; a caller-
        # supplied startAt would skip [0, startAt) and double-fetch the
        # page the range re-derives — refuse rather than silently do so
        raise ValueError(
            "offset_scan_parallel owns the startAt parameter (pages fan "
            "out from offset 0); pass only filter params"
        )
    first = with_retry(lambda: fetcher(url, params))
    total, stride = page_plan(first)  # type: ignore[arg-type]
    total = total or 0
    first_records = [json.dumps(r) for r in first.get(records_key, [])]  # type: ignore[union-attr]

    offsets = list(range(stride, total, stride))  # page 0 already fetched
    first_df = spark.createDataFrame(
        [(r,) for r in first_records], T.StructType([T.StructField("raw", T.StringType())])
    )
    if not offsets:
        return first_df

    offsets_df = spark.createDataFrame(
        [(o,) for o in offsets], T.StructType([T.StructField("start_at", T.LongType())])
    ).repartition(min(page_parallelism, len(offsets)))

    base_params = dict(params or {})

    def fetch_pages(batches):  # executor-side: one fetch per offset row
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for start_at in pdf["start_at"]:
                p = dict(base_params)
                p["startAt"] = int(start_at)
                page = with_retry(lambda p=p: fetcher(url, p))
                rows.extend(json.dumps(r) for r in page.get(records_key, []))
            yield pd.DataFrame({"raw": rows})

    rest_df = offsets_df.mapInPandas(fetch_pages, schema="raw string")
    return first_df.unionByName(rest_df)


def single_page_scan(fetcher: Fetcher, url: str, params: dict | None = None) -> list[dict]:
    """A4: one GET whose response is a bare JSON list
    (``users_processor.py:71,82``)."""
    page = with_retry(lambda: fetcher(url, params))
    if isinstance(page, dict):
        # list(dict) would silently yield the KEY STRINGS (e.g. Jira's
        # {"errorMessages": ..., "errors": ...} error body under HTTP
        # 200), which flatten downstream into all-NULL rows
        raise TypeError(
            f"single-page endpoint returned an object, not a list "
            f"(keys {sorted(page)[:5]}) — wrong endpoint shape or an "
            f"API error body"
        )
    return list(page)  # type: ignore[arg-type]


# ----------------------------------------------------- parse + flatten

def raw_json_to_flat(
    raw_df: DataFrame,
    mapping: Mapping,
    leaf_types: dict[str, T.DataType] | None = None,
) -> DataFrame:
    """Parse raw JSON record strings with the MAPPING-derived schema and
    apply the compiled flatten — the reference's A5 as one JVM select."""
    schema = mapping_to_schema(mapping, leaf_types)
    parsed = raw_df.select(F.from_json("raw", schema).alias("r")).select("r.*")
    return parsed.select(*compile_mapping(mapping, schema))


def records_to_flat_df(
    spark: SparkSession,
    records: list[dict],
    mapping: Mapping,
    leaf_types: dict[str, T.DataType] | None = None,
) -> DataFrame:
    """Driver-collected records (a cursor page) → flat DataFrame."""
    raw = spark.createDataFrame(
        [(json.dumps(r),) for r in records],
        T.StructType([T.StructField("raw", T.StringType())]),
    )
    return raw_json_to_flat(raw, mapping, leaf_types)
