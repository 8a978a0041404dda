"""Type-drift armor for the non-TPC-H fixture tables, the counterpart
of tests/test_tpch_drift_sweep.py: a regenerated events table could
ship ``value`` as DECIMAL and ids as INT32, documents could narrow its
ids/counters, and embeddings could ship float64 vectors. Spark's
catalog.conform already normalizes all of these on read; the oracle
side is normalized by oracle_norm's contract CTEs. Measured blast
radius before extending oracle_norm beyond TPC-H: source_paged_union
leaked a raw Decimal ``value`` (1 of 50 oracles); a float64 embedding
regen would shift cosine ulps unless both engines narrow to FLOAT[].

The sweep rewrites all three tables at the drifted types and re-runs
EVERY registered oracle that reads any of them."""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from airflow_jira_etl_spark import catalog, registry
from tests.oracle_check import compare, duckdb_conn

registry.load_all_queries()

SRC = "/root/testdata/sf0.01"
DRIFTED = ("events", "documents", "embeddings")


def _oracle_queries() -> list[str]:
    pats = [re.compile(rf"\b{t}\b") for t in DRIFTED]
    return sorted(
        n
        for n, sql in registry.ORACLES.items()
        if any(p.search(sql.lower()) for p in pats)
    )


def _narrow_ints(tab: pa.Table, cols: tuple[str, ...]) -> pa.Table:
    for c in cols:
        if pc.max(pc.abs(tab.column(c))).as_py() < 2**31:
            i = tab.schema.get_field_index(c)
            tab = tab.set_column(i, c, tab.column(c).cast(pa.int32()))
    return tab


@pytest.fixture(scope="module")
def drift_fixture(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("evdrift"))

    ev = pq.read_table(catalog.table_path(SRC, "events"))
    ev = ev.set_column(
        ev.schema.get_field_index("value"),
        "value",
        ev.column("value").cast(pa.decimal128(18, 6)),
    )
    ev = _narrow_ints(ev, ("event_id", "user_id"))
    pq.write_table(ev, os.path.join(tmp, "events.parquet"), store_schema=False)

    docs = pq.read_table(catalog.table_path(SRC, "documents"))
    docs = _narrow_ints(docs, ("doc_id", "n_chars"))
    pq.write_table(
        docs, os.path.join(tmp, "documents.parquet"), store_schema=False
    )

    em = pq.read_table(catalog.table_path(SRC, "embeddings"))
    em = em.set_column(
        em.schema.get_field_index("embedding"),
        "embedding",
        em.column("embedding").cast(pa.list_(pa.float64())),
    )
    pq.write_table(
        em, os.path.join(tmp, "embeddings.parquet"), store_schema=False
    )

    for t in catalog.TABLES:
        p = catalog.table_path(SRC, t)
        dst = os.path.join(tmp, os.path.basename(p))
        if not os.path.exists(dst):
            os.symlink(p, dst)
    return tmp


def test_fixture_really_drifted(drift_fixture):
    s = pq.read_schema(catalog.table_path(drift_fixture, "events"))
    assert s.field("value").type == pa.decimal128(18, 6)
    s = pq.read_schema(catalog.table_path(drift_fixture, "embeddings"))
    assert s.field("embedding").type == pa.list_(pa.float64())


def test_all_oracles_survive_nontpch_type_drift(spark, drift_fixture):
    """One sweep, all failures reported together."""
    con = duckdb_conn(drift_fixture)
    failures = {}
    for name in _oracle_queries():
        try:
            r = compare(
                registry.QUERIES[name](spark, drift_fixture),
                con,
                registry.ORACLES[name],
            )
            if r["errors"]:
                failures[name] = r["errors"][:2]
        except Exception as exc:  # noqa: BLE001 — collect, report below
            failures[name] = [f"raised: {exc!r:.200}"]
    assert not failures, (
        f"{len(failures)} oracle(s) diverge on decimal-events / "
        f"int32-documents / float64-embeddings drift: {failures}"
    )
