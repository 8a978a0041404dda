"""Driver-mimicking oracle comparison: Spark result vs DuckDB SQL.

Canonicalization mirrors the driver contract (BASELINE.md): row count,
column names (sorted), and an order-insensitive value comparison with
floats rounded to 4 dp. Used by tests/test_oracle.py to gate every
registered query before the driver ever sees it.
"""

from __future__ import annotations

import datetime
import math

import duckdb

from airflow_jira_etl_spark.catalog import TABLES, table_path

ROUND_DP = 4


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    # pin the session timezone: DuckDB's ICU extension defaults
    # TimeZone to the HOST zone, so any oracle that round-trips
    # through TIMESTAMPTZ (to_timestamp + cast to naive) would shift
    # by the host's UTC offset on a non-UTC machine while the Spark
    # side is pinned to UTC in session.py — a whole-row red that only
    # reproduces on some hosts. Guarded with try: the ICU extension
    # (which owns the setting) may be absent in a minimal build, and
    # without ICU there is no TIMESTAMPTZ conversion to drift.
    try:
        con.execute("SET TimeZone='UTC'")
    except duckdb.Error:
        pass
    for name in TABLES:
        path = table_path(sf_dir, name)
        # a fixture may ship as one file or a Spark-style directory of
        # part files; DuckDB needs a glob for the directory layout
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _canon_value(v):
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # + 0.0 collapses -0.0 to 0.0: the two compare EQUAL cell-wise
        # but render differently ('-0.0' vs '0.0'), and the row sort
        # keys on the rendering — an engine pair disagreeing only on
        # zero SIGN would misalign the sorted row lists and report a
        # false 'values differ'
        return round(v, ROUND_DP) + 0.0
    if isinstance(v, decimal.Decimal):
        # Decimal == float is EXACT (almost always False), so a
        # DECIMAL-typed oracle column mismatches the Spark float even
        # when values agree at 4 dp — same loud-guidance design as the
        # tz-aware branch below
        raise TypeError(
            "DECIMAL-typed value in oracle/Spark result; CAST the "
            "column AS DOUBLE so the 4-dp float convention applies"
        )
    if hasattr(v, "asDict"):
        # a Spark Row (struct-typed column) is a tuple subclass: the
        # bare-tuple canon would never match DuckDB's dict canon for
        # the same struct — canonicalize both to sorted (key, value)
        # pairs
        return tuple(sorted((k, _canon_value(x)) for k, x in v.asDict().items()))
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            # The driver compares schemas strictly: a DuckDB TIMESTAMPTZ
            # (e.g. bare to_timestamp()) never matches Spark's naive
            # TIMESTAMP even when values agree.  Failing loudly here keeps
            # the local harness exactly as strict as the driver.
            raise TypeError(
                "tz-aware datetime in oracle/Spark result; "
                "CAST the oracle column AS TIMESTAMP"
            )
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_value(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(row[i]) for i in order) for row in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare_detail(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Driver-format comparison record: the rows/schema/hash booleans
    the external sweep records, plus first mismatches when values
    differ. ONE implementation — `compare` (the pytest gate) and
    tools/correctness_local (the committed artifact) both build on it,
    so the two can never disagree on what "matches" means."""
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    duck = con.execute(sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    rows_match = len(spark_rows) == len(duck_rows)
    schema_match = sorted(spark_cols) == sorted(duck_cols)
    hash_match = None
    mismatches: list = []
    if rows_match and schema_match:
        s = canon_rows(spark_cols, spark_rows)
        d = canon_rows(duck_cols, duck_rows)
        hash_match = s == d
        if not hash_match:
            mismatches = [(a, b) for a, b in zip(s, d) if a != b][:3]
    return {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "hash_match": bool(hash_match) if hash_match is not None else False,
        "spark_rows": len(spark_rows),
        "oracle_rows": len(duck_rows),
        "spark_cols": sorted(spark_cols),
        "duck_cols": sorted(duck_cols),
        "mismatches": mismatches,
    }


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Return a diff report; empty `errors` list means match."""
    d = compare_detail(spark_df, con, sql)
    errors: list[str] = []
    if not d["schema_match"]:
        errors.append(
            f"columns differ: spark={d['spark_cols']} duck={d['duck_cols']}"
        )
    if not d["rows_match"]:
        errors.append(
            f"row count differs: spark={d['spark_rows']} duck={d['oracle_rows']}"
        )
    if not errors and not d["hash_match"]:
        errors.append(f"values differ; first mismatches: {d['mismatches']}")
    return {
        "errors": errors,
        "spark_rows": d["spark_rows"],
        "duck_rows": d["oracle_rows"],
    }
