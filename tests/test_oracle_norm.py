"""Unit gate for oracle_norm.drift_proof: the string surgery that pins
every TPC-H-reading oracle to contract types must be literal-safe,
WITH-merge-safe, and a strict no-op for non-TPC-H oracles.
tests/test_tpch_drift_sweep.py is the behavioral (value-level) gate."""

from __future__ import annotations

import re

import duckdb

from airflow_jira_etl_spark import registry
from airflow_jira_etl_spark.oracle_norm import (
    NORM_TABLES,
    code_text,
    drift_proof,
    scan_segments,
)

registry.load_all_queries()


def test_sql_without_fixture_tables_untouched():
    sql = "SELECT x, count(*) FROM my_staging_table GROUP BY x"
    assert drift_proof(sql) == sql


def test_norm_tables_is_exactly_the_catalog():
    from airflow_jira_etl_spark.catalog import TABLES

    assert sorted(NORM_TABLES) == sorted(TABLES)


def test_array_contract_type_renders():
    out = drift_proof("SELECT vec_id FROM embeddings")
    assert "CAST(embedding AS FLOAT[]) AS embedding" in out


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


def test_apostrophe_in_comment_does_not_flip_literal_parity():
    sql = (
        "SELECT c_name -- don't touch this\n"
        "FROM customer WHERE c_name = 'customer one'"
    )
    out = drift_proof(sql)
    assert "'customer one'" in out  # literal untouched
    assert "-- don't touch this" in out  # comment untouched
    assert "FROM customer__t" in out  # reference rewritten


def test_scanner_roundtrips_and_classifies():
    sql = "SELECT 'it''s' AS a -- trailing, isn't code\nFROM orders"
    segs = scan_segments(sql)
    assert "".join(s for _, s in segs) == sql
    assert code_text(sql) == "SELECT  AS a \nFROM orders"


def test_leading_comment_with_clause_still_merges():
    sql = (
        "-- doc comment\n"
        "WITH x AS (SELECT o_orderkey FROM orders) SELECT * FROM x"
    )
    out = drift_proof(sql)
    assert out.upper().count("WITH") == 1  # merged, not doubled
    assert "orders__t AS (SELECT" in out
    assert ", x AS (SELECT o_orderkey FROM orders__t)" in out

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT CAST(1 AS BIGINT) o_orderkey,"
        " CAST(1 AS BIGINT) o_custkey, 'O' o_orderstatus,"
        " CAST(1.0 AS DOUBLE) o_totalprice,"
        " TIMESTAMP '1995-01-01' o_orderdate, '1-URGENT' o_orderpriority"
    )
    assert con.execute(out).fetchall() == [(1,)]


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
    occurrence outside literals/comments is the CTE's own `FROM <t>)`.
    Uses oracle_norm.code_text — the SAME lexer drift_proof uses — so
    the coverage check and the rewriter can never disagree on what
    counts as a reference."""
    offenders = {}
    for name, sql in registry.ORACLES.items():
        code = code_text(sql)
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


def test_scanner_properties_on_generated_sql():
    """Property gate for the 3-state lexer: on any string built from
    SQL-ish fragments (code, balanced literals with '' escapes, line
    comments), segments must (1) concatenate back to the input,
    (2) classify every literal as one 'lit' segment with its quotes,
    (3) never contain a quote character inside a 'code' segment."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    code_frag = st.text(
        alphabet="abc_ ,.()\n-=<>0123456789", min_size=0, max_size=12
    ).filter(lambda s: "--" not in s)
    lit_frag = st.text(
        alphabet="abc -'", min_size=0, max_size=8
    ).map(lambda s: "'" + s.replace("'", "''") + "'")
    comment_frag = st.text(
        alphabet="abc '-", min_size=0, max_size=8
    ).filter(lambda s: "\n" not in s).map(lambda s: "--" + s + "\n")
    frag = st.one_of(code_frag, lit_frag, comment_frag)

    @settings(max_examples=300, deadline=None)
    @given(st.lists(frag, min_size=0, max_size=12))
    def check(frags):
        sql = "".join(frags)
        segs = scan_segments(sql)
        assert "".join(s for _, s in segs) == sql
        for kind, s in segs:
            if kind == "code":
                assert "'" not in s
            if kind == "lit":
                assert s.startswith("'") and s.endswith("'")
            if kind == "comment":
                assert s.startswith("--")

    check()


def test_fixture_table_reused_as_alias_raises():
    """The registration-time guard: drift_proof renames every bare
    fixture-table word, so an oracle aliasing something AS a fixture
    name must fail loudly instead of being silently rewritten."""
    import pytest

    with pytest.raises(ValueError, match="alias or"):
        drift_proof("SELECT o.o_orderkey FROM orders AS part")
    with pytest.raises(ValueError, match="alias or"):
        drift_proof(
            "WITH events AS (SELECT 1 AS x) "
            "SELECT e.x FROM events e JOIN orders o ON o.o_orderkey = e.x"
        )
    # comma-separated second CTE reusing a referenced table name
    with pytest.raises(ValueError, match="alias or"):
        drift_proof(
            "WITH base AS (SELECT * FROM lineitem), "
            "part AS (SELECT 1) SELECT * FROM base, part"
        )
    # implicit alias (no AS) right after a FROM table reference
    with pytest.raises(ValueError, match="alias or"):
        drift_proof("SELECT part.o_orderkey FROM orders part")
    # implicit alias after a JOIN
    with pytest.raises(ValueError, match="alias or"):
        drift_proof(
            "SELECT 1 FROM lineitem l JOIN orders part "
            "ON part.o_orderkey = l.l_orderkey"
        )
    # implicit alias on a comma-join item
    with pytest.raises(ValueError, match="alias or"):
        drift_proof("SELECT 1 FROM lineitem l, orders part")
    # column-list alias form "AS part(c1, ...)" is a reuse too
    with pytest.raises(ValueError, match="alias or"):
        drift_proof(
            "SELECT part.i FROM lineitem, (VALUES (1)) AS part(i)"
        )


def test_alias_guard_ignores_literals_and_near_misses():
    # table word inside a string literal: not code, no guard, no rename
    sql = "SELECT 'AS part' AS label, count(*) AS part_cnt FROM lineitem"
    out = drift_proof(sql)
    assert "'AS part'" in out and "part_cnt" in out
    # CAST target and underscore-joined identifiers are not bare words
    out2 = drift_proof("SELECT CAST(l_orderkey AS BIGINT) AS k FROM lineitem")
    assert "lineitem__t" in out2


def test_guard_catches_implicit_and_column_list_alias_forms():
    """Verified-by-execution gaps from review: the implicit select-list
    alias (no comma before it), the derived-table alias, and the
    column-list CTE form were all silently rewritten into renamed
    output columns / duplicate CTE names instead of the loud
    registration-time error."""
    import pytest

    from airflow_jira_etl_spark.oracle_norm import drift_proof

    for bad in (
        "SELECT l_quantity part FROM lineitem",
        "WITH part(c1) AS (SELECT 1) SELECT c1 FROM part",
        "SELECT * FROM (SELECT 1) part, lineitem",
    ):
        with pytest.raises(ValueError, match="reuses fixture-table"):
            drift_proof(bad)
