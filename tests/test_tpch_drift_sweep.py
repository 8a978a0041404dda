"""Whole-family type-drift defense for the TPC-H tables (see
test_compound_drift_sweep for all families drifted at once).
The driver regenerates /root/testdata between rounds
and has already shipped breaking type drift once (events
TIMESTAMP(NANOS), the r04 incident) and content drift once (the
documents corpus regen). The TPC-H tables currently arrive as
double/timestamp[us]/int64 — but the TPC-H spec types them as
DECIMAL(12,2) money, DATE dates and 32-bit keys, so a spec-faithful
regen is the plausible next drift.

This sweep rewrites every TPC-H table at spec types (money -> decimal,
date -> date32, keys -> int32 where values fit) and re-runs EVERY
registered oracle that reads any of them, Spark loading through the
catalog path and DuckDB reading the drifted parquet natively, exactly
as the driver's view registration does. Engine pairs that silently
disagree under decimal/date inputs (decimal-vs-double type promotion in
avg(), date-vs-timestamp outputs of date arithmetic, scale-growth
rounding) fail here before the driver can catch them."""

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

TPCH = ["lineitem", "orders", "customer", "supplier", "part", "nation", "region"]

# Spec-type drift per table: column -> target arrow type.
_MONEY = pa.decimal128(12, 2)
_DRIFT: dict[str, dict[str, pa.DataType]] = {
    "lineitem": {
        "l_orderkey": pa.int32(),
        "l_partkey": pa.int32(),
        "l_suppkey": pa.int32(),
        "l_quantity": _MONEY,
        "l_extendedprice": _MONEY,
        "l_discount": _MONEY,
        "l_tax": _MONEY,
        "l_shipdate": pa.date32(),
    },
    "orders": {
        "o_orderkey": pa.int32(),
        "o_custkey": pa.int32(),
        "o_totalprice": _MONEY,
        "o_orderdate": pa.date32(),
    },
    "customer": {"c_custkey": pa.int32(), "c_acctbal": _MONEY},
    "supplier": {"s_suppkey": pa.int32(), "s_acctbal": _MONEY},
    "part": {"p_partkey": pa.int32(), "p_retailprice": _MONEY},
    "nation": {},
    "region": {},
}


def _tpch_oracle_queries() -> list[str]:
    pats = [re.compile(r"\b" + t + r"\b") for t in TPCH]
    return sorted(
        n
        for n, sql in registry.ORACLES.items()
        if any(p.search(sql.lower()) for p in pats)
    )


def _drift_table(tab: pa.Table, casts: dict[str, pa.DataType]) -> pa.Table:
    for col, typ in casts.items():
        i = tab.schema.get_field_index(col)
        src = tab.column(col)
        if pa.types.is_int32(typ):
            mx = pc.max(pc.abs(src)).as_py()
            assert mx is None or mx < 2**31, f"{col} overflows int32: {mx}"
        if pa.types.is_date32(typ):
            # timestamp[us] -> date: values are midnight-aligned in the
            # current fixtures; a lossy cast here would invalidate parity.
            trunc = pc.floor_temporal(src, unit="day")
            assert pc.all(pc.equal(trunc, src)).as_py() in (True, None), (
                f"{col} has intra-day times; date32 drift would be lossy"
            )
        tab = tab.set_column(i, col, src.cast(typ))
    return tab


@pytest.fixture(scope="module")
def spec_fixture(tmp_path_factory):
    """sf0.01 with every TPC-H table re-written at spec types; the
    non-TPC-H tables symlinked unchanged."""
    tmp = str(tmp_path_factory.mktemp("tpchdrift"))
    for t in catalog.TABLES:
        p = catalog.table_path(SRC, t)
        if t in TPCH:
            drifted = _drift_table(pq.read_table(p), _DRIFT[t])
            pq.write_table(
                drifted, os.path.join(tmp, os.path.basename(p)), store_schema=False
            )
        else:
            os.symlink(p, os.path.join(tmp, os.path.basename(p)))
    return tmp


def test_fixture_really_drifted(spec_fixture):
    s = pq.read_schema(catalog.table_path(spec_fixture, "lineitem"))
    assert s.field("l_extendedprice").type == _MONEY
    assert s.field("l_shipdate").type == pa.date32()
    assert s.field("l_orderkey").type == pa.int32()


def test_all_tpch_oracles_survive_spec_type_drift(spark, spec_fixture):
    """One sweep, all failures reported together: every TPC-H-reading
    oracle must hash-match on the spec-typed fixture."""
    con = duckdb_conn(spec_fixture)
    failures = {}
    for name in _tpch_oracle_queries():
        try:
            r = compare(
                registry.QUERIES[name](spark, spec_fixture),
                con,
                registry.ORACLES[name],
            )
            if r["errors"]:
                failures[name] = r["errors"][:2]
        except Exception as exc:  # noqa: BLE001 — collect, report below
            failures[name] = [f"raised: {exc!r:.200}"]
    assert not failures, (
        f"{len(failures)} TPC-H oracle(s) diverge on a spec-typed "
        f"(decimal/date32/int32) fixture: {failures}"
    )


def test_directory_shaped_table_loads_and_matches_oracle(spark, tmp_path):
    """Layout drift, not type drift: a regenerated fixture could ship a
    table as a Spark-style DIRECTORY of part files. catalog.load reads
    either layout (spark.read.parquet handles directories) and the
    DuckDB harness globs directory sources — one differential check
    proves both sides agree on the split table."""
    fix = str(tmp_path / "dirfix")
    os.makedirs(fix)
    t = pq.read_table(catalog.table_path(SRC, "orders"))
    part_dir = os.path.join(fix, "orders.parquet")
    os.makedirs(part_dir)
    half = t.num_rows // 2
    pq.write_table(
        t.slice(0, half), os.path.join(part_dir, "part-0.parquet"),
        store_schema=False,
    )
    pq.write_table(
        t.slice(half), os.path.join(part_dir, "part-1.parquet"),
        store_schema=False,
    )
    for name in catalog.TABLES:
        dst = os.path.join(fix, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(catalog.table_path(SRC, name), dst)
    con = duckdb_conn(fix)
    r = compare(
        registry.QUERIES["sort_multi_key"](spark, fix),
        con,
        registry.ORACLES["sort_multi_key"],
    )
    assert not r["errors"], r["errors"]
    assert r["spark_rows"] > 0


def test_column_order_and_extra_column_drift(spark, tmp_path):
    """A regenerated fixture could reorder columns or append new ones
    (schema evolution). Both sides canonicalize by construction —
    catalog.conform selects the declared columns by name, and the
    oracle contract CTE projects the same declared list — so the
    differential must hold on a reversed-column nation table carrying
    an extra column neither engine declared."""
    fix = str(tmp_path / "colfix")
    os.makedirs(fix)
    t = pq.read_table(catalog.table_path(SRC, "nation"))
    cols = list(reversed(t.column_names))
    t = t.select(cols).append_column(
        "n_comment", pa.array(["x"] * t.num_rows)
    )
    pq.write_table(t, os.path.join(fix, "nation.parquet"), store_schema=False)
    for name in catalog.TABLES:
        dst = os.path.join(fix, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(catalog.table_path(SRC, name), dst)
    con = duckdb_conn(fix)
    r = compare(
        registry.QUERIES["join_broadcast_dim"](spark, fix),
        con,
        registry.ORACLES["join_broadcast_dim"],
    )
    assert not r["errors"], r["errors"]
    assert r["spark_rows"] > 0
