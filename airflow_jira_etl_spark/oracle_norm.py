"""Drift-proofing for DuckDB oracle SQL: pin TPC-H inputs to the
declared contract types.

The Spark side of every differential check is already layout-proof:
``catalog.load`` reads a fixture under its own footer schema and
``conform``s it to the declared ``StructType`` (the generalized fix for
the r04 events-NANOS incident). The DuckDB side had no equivalent — the
driver registers raw parquet views, so a spec-faithful fixture regen
(money as DECIMAL(12,2), dates as DATE, keys as INT32 — the types the
TPC-H spec actually mandates) would leave the oracle computing in
decimal/date while Spark computes in double/timestamp. Measured blast
radius before this module: 21 of 63 TPC-H-reading oracles hash-diverge
on such a fixture (tests/test_tpch_drift_sweep.py), via Decimal-vs-float
outputs, decimal-exact vs float avg/percentile interpolation, and
date-vs-timestamp rendering.

``drift_proof`` rewrites an oracle to read each referenced TPC-H table
through a CTE that CASTs every column to the same contract type Spark's
``conform`` produces, generated from ``catalog.SCHEMAS`` so there is
exactly one source of truth. On today's fixtures every cast is a no-op;
under type drift both engines converge to the contract types before any
arithmetic happens.

Only the TPC-H tables are normalized: int-width drift is value-invisible
(both engines surface Python ints), events already floors NANOS at scan
on both sides (DuckDB converts ns parquet to µs TIMESTAMP at read;
Spark conform divs by 1000 — both truncate), and documents/embeddings
carry no decimal/date-capable columns. The TPC-H money/date columns are
the one place a plausible regen changes arithmetic semantics.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

from airflow_jira_etl_spark.catalog import SCHEMAS

# Tables whose contract types a spec-faithful regen could change in
# arithmetic-visible ways (decimal money, date dates).
NORM_TABLES = (
    "lineitem",
    "orders",
    "customer",
    "supplier",
    "part",
    "nation",
    "region",
)

_DUCK_TYPE = {
    T.LongType: "BIGINT",
    T.IntegerType: "INTEGER",
    T.DoubleType: "DOUBLE",
    T.StringType: "VARCHAR",
    T.TimestampType: "TIMESTAMP",
}

# Single-quoted SQL literals (with '' escapes); replacement never
# touches the inside of these.
_LITERAL = re.compile(r"('(?:[^']|'')*')")
_WITH = re.compile(r"\s*WITH\s+(RECURSIVE\s+)?", re.IGNORECASE)


def _contract_cte(table: str) -> str:
    fields = SCHEMAS[table].fields
    cols = ", ".join(
        f"CAST({f.name} AS {_DUCK_TYPE[type(f.dataType)]}) AS {f.name}"
        for f in fields
    )
    return f"{table}__t AS (SELECT {cols} FROM {table})"


def drift_proof(sql: str) -> str:
    """Return ``sql`` with every TPC-H table reference routed through a
    contract-typed CTE; unchanged when no TPC-H table is referenced."""
    parts = _LITERAL.split(sql)
    code = [p for i, p in enumerate(parts) if i % 2 == 0]
    referenced = [
        t
        for t in NORM_TABLES
        if any(re.search(rf"\b{t}\b", p, re.IGNORECASE) for p in code)
    ]
    if not referenced:
        return sql
    for i in range(0, len(parts), 2):
        for t in referenced:
            parts[i] = re.sub(
                rf"\b{t}\b", f"{t}__t", parts[i], flags=re.IGNORECASE
            )
    body = "".join(parts)
    preamble = ", ".join(_contract_cte(t) for t in referenced)
    m = _WITH.match(body)
    if m:  # merge into the oracle's own WITH list (RECURSIVE kept first)
        rec = m.group(1) or ""
        return f"WITH {rec}{preamble}, {body[m.end():]}"
    return f"WITH {preamble} {body}"
