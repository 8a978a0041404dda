"""Content-drift armor for the TPC-H family, completing the set
(events=ns jitter, documents=adversarial corpus, embeddings=degenerate
vectors, TPC-H types=spec drift — this file covers TPC-H *values*).

The driver regenerates fixtures between rounds, and the r04 documents
regen proved content can change shape radically (a 30-word vocabulary
saturated the old LSH geometry). Today's TPC-H columns are near-unique,
so five rounds of green rows prove nothing about TIES: a regenerated
corpus with duplicated prices/dates would expose any top-k / rank /
row_number whose ORDER BY is not a total order — Spark and DuckDB then
legally pick different rows and the driver sees a hash-red.

This sweep generates a deliberately tie-heavy star schema (a handful of
distinct prices/dates/quantities, duplicate customer and part names,
one hot key per fact table, orphan foreign keys, negative and exactly
zero balances), keeps the real region/nation dims so every literal
filter still selects rows, and re-runs EVERY TPC-H-reading oracle on
it. NULL-freeness matches the observed fixture contract (no generation
has ever shipped NULLs in these tables)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from airflow_jira_etl_spark import catalog, registry
from tests.oracle_check import compare, duckdb_conn
from tests.test_tpch_drift_sweep import _tpch_oracle_queries

registry.load_all_queries()

SRC = "/root/testdata/sf0.01"

# Heavily-duplicated value pools (2-dp money, as every generation ships).
_MONEY = [0.0, 0.01, -999.99, 100.0, 5000.5, 99999.99, 12345.67, 777.77]
_DATES_US = [
    np.datetime64(d, "us")
    for d in (
        ["1994-01-01", "1994-12-31", "1995-01-01", "1995-03-15", "1995-06-17"]
        + ["1996-01-01", "1996-02-29", "1996-12-31", "1997-07-04", "1997-12-31"]
        + ["1998-01-01", "1998-08-02", "1998-12-01"]
    )
]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
_PWORDS = ["blue", "small", "anvil", "widget", "copper", "gear"]


def _hot(rng, n, lo, hi, hot_val, hot_frac):
    """Uniform ints in [lo, hi) with a hot key taking ``hot_frac``."""
    out = rng.randint(lo, hi, size=n)
    out[rng.rand(n) < hot_frac] = hot_val
    return out


@pytest.fixture(scope="module")
def tie_fixture(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("tpchties"))
    rng = np.random.RandomState(42)

    def write(name, cols):
        pq.write_table(
            pa.table(cols), os.path.join(tmp, f"{name}.parquet"), store_schema=False
        )

    n_cust, n_ord, n_li, n_part, n_supp = 600, 3000, 12000, 200, 40
    write(
        "customer",
        {
            "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
            "c_name": [f"Customer#{k % 50:09d}" for k in range(n_cust)],
            "c_nationkey": pa.array(
                _hot(rng, n_cust, 0, 25, 0, 0.4), pa.int32()
            ),
            "c_acctbal": rng.choice(_MONEY, n_cust),
            "c_mktsegment": rng.choice(_SEGMENTS, n_cust),
        },
    )
    write(
        "orders",
        {
            "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
            # orphan custkeys (600-699) exercise outer-join NULL paths
            "o_custkey": pa.array(_hot(rng, n_ord, 0, 700, 0, 0.2), pa.int64()),
            "o_orderstatus": rng.choice(["F", "O", "P"], n_ord),
            "o_totalprice": rng.choice(_MONEY, n_ord),
            "o_orderdate": pa.array(rng.choice(_DATES_US, n_ord)),
            "o_orderpriority": rng.choice(_PRIORITIES, n_ord),
        },
    )
    write(
        "lineitem",
        {
            "l_orderkey": pa.array(_hot(rng, n_li, 0, n_ord, 0, 0.25), pa.int64()),
            "l_partkey": pa.array(_hot(rng, n_li, 0, n_part, 0, 0.1), pa.int64()),
            "l_suppkey": pa.array(rng.randint(0, n_supp, n_li), pa.int64()),
            "l_linenumber": pa.array(rng.randint(1, 8, n_li), pa.int32()),
            "l_quantity": rng.randint(1, 51, n_li).astype(float),
            "l_extendedprice": rng.choice(_MONEY, n_li),
            "l_discount": rng.choice(np.round(np.arange(0, 0.11, 0.01), 2), n_li),
            "l_tax": rng.choice(np.round(np.arange(0, 0.09, 0.01), 2), n_li),
            "l_returnflag": rng.choice(["A", "N", "R"], n_li),
            "l_linestatus": rng.choice(["F", "O"], n_li),
            "l_shipdate": pa.array(rng.choice(_DATES_US, n_li)),
        },
    )
    write(
        "part",
        {
            "p_partkey": pa.array(np.arange(n_part), pa.int64()),
            # duplicate names: 6*6 vocab over 200 parts
            "p_name": [
                f"{_PWORDS[k % 6]} {_PWORDS[(k // 6) % 6]}" for k in range(n_part)
            ],
            "p_brand": [f"Brand#{k % 25 + 1}" for k in range(n_part)],
            "p_type": rng.choice(_PTYPES, n_part),
            "p_size": pa.array(rng.randint(1, 11, n_part), pa.int32()),
            "p_retailprice": rng.choice(_MONEY, n_part),
        },
    )
    write(
        "supplier",
        {
            "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
            "s_name": [f"Supplier#{k % 10:09d}" for k in range(n_supp)],
            "s_nationkey": pa.array(np.arange(n_supp) % 25, pa.int32()),
            "s_acctbal": rng.choice(_MONEY, n_supp),
        },
    )
    # real dims keep literal region/nation filters selecting rows;
    # non-TPC-H tables unchanged
    for t in catalog.TABLES:
        p = catalog.table_path(SRC, t)
        dst = os.path.join(tmp, os.path.basename(p))
        if not os.path.exists(dst):
            os.symlink(p, dst)
    return tmp


def test_fixture_really_is_tie_heavy(tie_fixture):
    t = pq.read_table(catalog.table_path(tie_fixture, "orders"))
    prices = t.column("o_totalprice").to_pylist()
    assert len(set(prices)) <= len(_MONEY)  # massive ties by construction


def test_all_tpch_oracles_survive_content_drift(spark, tie_fixture):
    """One sweep, all failures reported together: every TPC-H-reading
    oracle must hash-match on the tie-heavy corpus."""
    con = duckdb_conn(tie_fixture)
    failures = {}
    for name in _tpch_oracle_queries():
        try:
            r = compare(
                registry.QUERIES[name](spark, tie_fixture),
                con,
                registry.ORACLES[name],
            )
            if r["errors"]:
                failures[name] = r["errors"][:2]
        except Exception as exc:  # noqa: BLE001 — collect, report below
            failures[name] = [f"raised: {exc!r:.200}"]
    assert not failures, (
        f"{len(failures)} TPC-H oracle(s) diverge on a tie-heavy "
        f"corpus: {failures}"
    )
