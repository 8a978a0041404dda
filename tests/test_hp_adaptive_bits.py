"""Adaptive hyperplane-LSH geometry (queries/llm_ops._hp_n_bits):
the bucket-bit count grows with corpus size so candidate pairs stay
linear in n. Three layers of defense:

1. the integer threshold formula itself (bit_length arithmetic);
2. the SQL CASE ladder must agree with the Python formula branch for
   branch (it is what the DuckDB oracle evaluates);
3. a >4096-vector corpus (the smallest size that leaves the historical
   6-bit geometry) must hash-match between Spark — which builds only
   n_bits planes — and the oracle — which computes all 48 planes and
   reduces modulo 2^n_bits. Every fixture value is a multiple of 1/64
   so float32/float64 agree exactly.
"""

from __future__ import annotations

import os
import random
import re

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from airflow_jira_etl_spark import catalog, registry
from airflow_jira_etl_spark.queries.llm_ops import (
    _HP_MAX_BITS,
    _HP_MIN_BITS,
    _HP_TARGET,
    _hp_n_bits,
    _hp_npow_sql,
)
from tests.oracle_check import compare, duckdb_conn

registry.load_all_queries()

SRC = "/root/testdata/sf0.01"
DIM = 64


def test_hp_n_bits_thresholds():
    assert _hp_n_bits(0) == _HP_MIN_BITS
    assert _hp_n_bits(1) == _HP_MIN_BITS
    assert _hp_n_bits(_HP_TARGET * 64) == 6  # 4096 -> still 6 bits
    assert _hp_n_bits(_HP_TARGET * 64 + 1) == 7  # 4097 -> 7 bits
    assert _hp_n_bits(_HP_TARGET * 128) == 7
    assert _hp_n_bits(_HP_TARGET * 128 + 1) == 8
    assert _hp_n_bits(10**30) == _HP_MAX_BITS  # clamp


@pytest.mark.parametrize(
    "n",
    [1, 63, 64, 4095, 4096, 4097, 8192, 8193, 10**6, 64 * 2**47, 64 * 2**47 + 1],
)
def test_sql_ladder_matches_python_formula(n):
    """The oracle-side CASE ladder and _hp_n_bits must be the same
    function of the row count — evaluate the ladder with the count
    subquery replaced by the literal n."""
    sql = _hp_npow_sql("t")
    lit = re.sub(
        r"\(SELECT count\(\*\) AS cnt FROM t\)",
        f"(SELECT CAST({n} AS BIGINT) AS cnt)",
        sql,
    )
    assert lit != sql  # the substitution must have found the subquery
    got = duckdb.connect().execute(f"SELECT {lit}").fetchone()[0]
    assert got == (1 << _hp_n_bits(n)), (n, got)


@pytest.fixture(scope="module")
def big_emb_fixture(tmp_path_factory):
    """4100 vectors (the first corpus size that selects 7-bit buckets)
    in 80 loose clusters, plus the usual adversarial rows."""
    tmp = str(tmp_path_factory.mktemp("hpbits"))
    for t in catalog.TABLES:
        p = catalog.table_path(SRC, t)
        os.symlink(p, os.path.join(tmp, os.path.basename(p)))
    rng = random.Random(4100)
    rows = []
    vid = 0
    for label in range(80):
        center = [rng.randint(-32, 32) / 64.0 for _ in range(DIM)]
        for _ in range(51):
            v = [c + rng.randint(-8, 8) / 64.0 for c in center]
            rows.append((vid, v, label % 10))
            vid += 1
    rows.append((500_000, [0.0] * DIM, 0))  # zero vector: cs guard
    rows.append((500_001, [-1.0] * DIM, 1))
    assert len(rows) == 4082  # + replicas below crosses 4096
    for j in range(20):
        rows.append((600_000 + j, list(rows[j][1]), rows[j][2]))
    assert len(rows) > 4096
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    os.remove(os.path.join(tmp, "embeddings.parquet"))
    pq.write_table(
        table, os.path.join(tmp, "embeddings.parquet"), store_schema=False
    )
    return tmp


def test_pairs_threshold_hash_matches_above_4096(spark, big_emb_fixture):
    assert _hp_n_bits(4102) == 7  # the corpus really exercises 7 bits
    con = duckdb_conn(big_emb_fixture)
    r = compare(
        registry.QUERIES["llm_sim_pairs_threshold"](spark, big_emb_fixture),
        con,
        registry.ORACLES["llm_sim_pairs_threshold"],
    )
    assert not r["errors"], r["errors"]
    assert r["spark_rows"] > 0  # the duplicate pairs guarantee output


def test_semantic_clusters_hash_matches_above_4096(spark, big_emb_fixture):
    con = duckdb_conn(big_emb_fixture)
    r = compare(
        registry.QUERIES["llm_dedup_semantic_clusters"](spark, big_emb_fixture),
        con,
        registry.ORACLES["llm_dedup_semantic_clusters"],
    )
    assert not r["errors"], r["errors"]
    assert r["spark_rows"] > 4096
