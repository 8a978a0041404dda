"""Whole-family defense against NON-FINITE drift in the events float
measure column — the round-12 sibling of the nanos (ts), documents,
and embeddings sweeps.

Planting one NaN, one +Inf and one −Inf in ``events.value`` surfaced
three real contract gaps before this sweep existed (all fixed, all
conventions now stated where they live):

- DuckDB's STDDEV_SAMP/VAR_SAMP HARD-ERROR ('out of range') on any
  non-finite input, and quantile_cont yields NaN where Spark's
  percentile sorts NaN last — agg_stats now carries a non-finite →
  NULL guard rung on both engines (the cosine-ladder pattern);
- a NaN aggregate crossing the pandas/Arrow bridge back to Spark
  arrives as NULL while plain SQL keeps NaN — the udaf_grouped_agg
  and stream_stateful_profile oracles pin that bridge convention
  explicitly.

min/max/sum/avg need no guard: both engines agree raw (NaN greatest,
Inf propagates), which this sweep keeps verified.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from airflow_jira_etl_spark import catalog, registry
from tests.oracle_check import compare, duckdb_conn

registry.load_all_queries()

SRC = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def nonfinite_fixture(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("valuedrift"))
    for t in catalog.TABLES:
        p = catalog.table_path(SRC, t)
        os.symlink(p, os.path.join(tmp, os.path.basename(p)))
    os.remove(os.path.join(tmp, "events.parquet"))
    tbl = pq.read_table(catalog.table_path(SRC, "events"))
    vals = tbl.column("value").to_pylist()
    # three rows, three shapes, far enough apart to land in different
    # groups/users/pages
    vals[7] = float("nan")
    vals[1001] = float("inf")
    vals[2003] = float("-inf")
    tbl = tbl.set_column(
        tbl.schema.get_field_index("value"),
        "value",
        pa.array(vals, tbl.schema.field("value").type),
    )
    pq.write_table(
        tbl, os.path.join(tmp, "events.parquet"), store_schema=False
    )
    return tmp


def test_all_events_oracles_survive_nonfinite_values(
    spark, nonfinite_fixture
):
    con = duckdb_conn(nonfinite_fixture)
    names = sorted(
        n
        for n, sql in registry.ORACLES.items()
        if "events" in sql.lower()
    )
    assert len(names) >= 40  # the whole events-reading family
    failures = {}
    for name in names:
        try:
            r = compare(
                registry.QUERIES[name](spark, nonfinite_fixture),
                con,
                registry.ORACLES[name],
            )
            if r["errors"]:
                failures[name] = r["errors"][:2]
        except Exception as exc:  # noqa: BLE001 — collect, report below
            failures[name] = [f"raised: {exc!r:.200}"]
    assert not failures, (
        f"{len(failures)} events oracle(s) diverge under non-finite "
        f"value drift: {failures}"
    )
