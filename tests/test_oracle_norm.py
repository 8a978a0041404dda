"""Unit gate for oracle_norm.drift_proof: the string surgery that pins
every TPC-H-reading oracle to contract types must be literal-safe,
WITH-merge-safe, and a strict no-op for non-TPC-H oracles.
tests/test_tpch_drift_sweep.py is the behavioral (value-level) gate."""

from __future__ import annotations

import re

import duckdb

from airflow_jira_etl_spark import registry
from airflow_jira_etl_spark.oracle_norm import NORM_TABLES, drift_proof

registry.load_all_queries()


def test_non_tpch_sql_untouched():
    sql = "SELECT doc_id, ts FROM documents JOIN events USING (doc_id)"
    assert drift_proof(sql) == sql


def test_plain_select_gets_preamble_and_rewrite():
    out = drift_proof("SELECT l_orderkey FROM lineitem")
    assert out.startswith("WITH lineitem__t AS (SELECT CAST(l_orderkey AS BIGINT)")
    assert "FROM lineitem__t" in out
    # the CTE body's own read targets the base view, not itself
    assert re.search(r"FROM lineitem\)", out)


def test_string_literals_protected():
    out = drift_proof(
        "SELECT c_name FROM customer WHERE c_name LIKE 'customer part%'"
    )
    assert "'customer part%'" in out  # literal untouched
    assert "FROM customer__t" in out


def test_existing_with_is_merged():
    out = drift_proof(
        "WITH big AS (SELECT o_orderkey FROM orders) SELECT * FROM big"
    )
    assert out.lower().startswith("with orders__t as")
    assert ", big AS (SELECT o_orderkey FROM orders__t)" in out
    assert out.count("WITH ") == 1


def test_recursive_with_keeps_keyword_first():
    out = drift_proof(
        "WITH RECURSIVE r AS (SELECT n_nationkey FROM nation) SELECT * FROM r"
    )
    assert re.match(r"WITH RECURSIVE\s+nation__t AS", out)


def test_word_boundaries_do_not_hit_identifiers():
    out = drift_proof(
        "SELECT date_part('day', o_orderdate) AS d, o_partial FROM orders"
    )
    assert "date_part(" in out  # 'part' inside date_part untouched
    assert "o_partial" in out


def test_runs_on_duckdb_and_casts_apply():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW part AS SELECT CAST(1 AS INTEGER) p_partkey, 'x' p_name,"
        " 'b' p_brand, 't' p_type, CAST(2 AS BIGINT) p_size,"
        " CAST(1.50 AS DECIMAL(12,2)) p_retailprice"
    )
    out = drift_proof(
        "SELECT p_partkey, p_retailprice,"
        " typeof(p_retailprice) AS t_price, typeof(p_partkey) AS t_key"
        " FROM part"
    )
    rows = con.execute(out).fetchall()
    assert rows == [(1, 1.5, "DOUBLE", "BIGINT")]  # decimal/int32 normalized


def test_every_registered_oracle_still_parses():
    """Transformed oracles must at least bind on empty contract-typed
    views — catches any surgery that breaks SQL syntax."""
    con = duckdb.connect()
    from airflow_jira_etl_spark.catalog import SCHEMAS, TABLES

    duck = {
        "LongType()": "BIGINT",
        "IntegerType()": "INTEGER",
        "DoubleType()": "DOUBLE",
        "StringType()": "VARCHAR",
        "TimestampType()": "TIMESTAMP",
        "ArrayType(FloatType(), True)": "FLOAT[]",
    }
    for t in TABLES:
        cols = ", ".join(
            f"CAST(NULL AS {duck[str(f.dataType)]}) AS {f.name}"
            for f in SCHEMAS[t].fields
        )
        con.execute(f"CREATE VIEW {t} AS SELECT {cols} WHERE 1=0")
    failures = {}
    for name, sql in registry.ORACLES.items():
        try:
            con.execute(f"SELECT * FROM ({sql}) q WHERE 1=0")
        except Exception as exc:  # noqa: BLE001
            failures[name] = repr(exc)[:200]
    assert not failures, failures


def test_all_norm_tables_have_contract_ctes_in_registry():
    """Every registered TPC-H-reading oracle actually got the rewrite:
    after drift_proof, each referenced table's ONLY bare (non-__t)
    occurrence outside string literals is the CTE's own `FROM <t>)`."""
    offenders = {}
    for name, sql in registry.ORACLES.items():
        code = "".join(re.split(r"'(?:[^']|'')*'", sql)[::2])
        for t in NORM_TABLES:
            bare = [
                m
                for m in re.finditer(rf"\b{t}\b", code, re.IGNORECASE)
                if code[m.end() : m.end() + 3] != "__t"
            ]
            has_cte = f"{t}__t AS (SELECT" in sql
            if bare and not has_cte:
                offenders[name] = f"bare {t} without contract CTE"
            if has_cte and len(bare) != 1:
                offenders[name] = f"{len(bare)} bare {t} refs, expected 1"
    assert not offenders, offenders
