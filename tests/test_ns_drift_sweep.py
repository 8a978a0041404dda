"""Whole-family defense against the driver's recurring fixture hazard:
the events table has shipped as TIMESTAMP(NANOS) in some fixture
generations and TIMESTAMP(MICROS) in others (the r04 incident: 5
hash-red driver rows; the r05 hash-only red on win_concurrency_sweep is
consistent with the same mechanism at sweep time).

This sweep rewrites events.parquet at NANOS precision with
deterministic sub-microsecond jitter (ts_ns = ts_us*1000 + event_id %
1000 — never crosses a micro boundary, so a consistent floor on both
engines must reproduce the micros results exactly) and re-runs EVERY
registered query whose oracle reads events, Spark loading through
catalog's footer-sniff path and DuckDB reading the nanos parquet
natively, exactly as the driver's view registration does. Any oracle
that uses raw ns-precision ts on the DuckDB side while Spark sees
floored micros (tie splits in windows, group-key splits, boundary
coincidence shifts) fails here before the driver can catch it."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from airflow_jira_etl_spark import catalog, registry
from tests.oracle_check import compare, duckdb_conn

registry.load_all_queries()

SRC = "/root/testdata/sf0.01"
N_EVENTS = 4000  # enough rows for every query shape; keeps the sweep fast


def _events_oracle_queries() -> list[str]:
    return sorted(
        n for n, sql in registry.ORACLES.items() if "events" in sql.lower()
    )


@pytest.fixture(scope="module")
def ns_fixture(tmp_path_factory):
    """sf0.01 with events re-written at TIMESTAMP(NANOS) + sub-µs jitter;
    every other table symlinked unchanged."""
    tmp = str(tmp_path_factory.mktemp("nsdrift"))
    for t in catalog.TABLES:
        p = catalog.table_path(SRC, t)
        os.symlink(p, os.path.join(tmp, os.path.basename(p)))
    ev = pq.read_table(catalog.table_path(SRC, "events")).slice(0, N_EVENTS)
    us = ev.column("ts").cast(pa.int64()).to_pylist()
    eid = ev.column("event_id").to_pylist()
    ns = [u * 1000 + (e % 1000) for u, e in zip(us, eid)]
    ev = ev.set_column(
        ev.schema.get_field_index("ts"),
        "ts",
        pa.array(ns, pa.timestamp("ns")),
    )
    os.remove(os.path.join(tmp, "events.parquet"))
    pq.write_table(
        ev, os.path.join(tmp, "events.parquet"), store_schema=False
    )
    return tmp


def test_fixture_really_is_nanos(spark, ns_fixture):
    path = catalog.table_path(ns_fixture, "events")
    assert catalog.events_ts_is_nanos(spark, path)


def test_all_events_oracles_survive_nanos_drift(spark, ns_fixture):
    """One sweep, all failures reported together: every events-reading
    oracle must hash-match on the jittered nanos fixture."""
    con = duckdb_conn(ns_fixture)
    failures = {}
    for name in _events_oracle_queries():
        try:
            r = compare(
                registry.QUERIES[name](spark, ns_fixture),
                con,
                registry.ORACLES[name],
            )
            if r["errors"]:
                failures[name] = r["errors"][:2]
        except Exception as exc:  # noqa: BLE001 — collect, report below
            failures[name] = [f"raised: {exc!r:.200}"]
    assert not failures, (
        f"{len(failures)} events oracle(s) diverge on a NANOS fixture "
        f"with sub-µs jitter: {failures}"
    )
