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

``drift_proof`` rewrites an oracle to read each referenced fixture table
through a CTE that CASTs every column to the same contract type Spark's
``conform`` produces, generated from ``catalog.SCHEMAS`` so there is
exactly one source of truth. On today's fixtures every cast is a no-op;
under type drift both engines converge to the contract types before any
arithmetic happens.

Every fixture table is normalized. TPC-H money/dates are where a
spec-faithful regen bites hardest (21/63 measured), but a decimal
events ``value`` leaks a raw Decimal through ``source_paged_union``
(measured, 1/50), and a float64 ``embedding`` regen would silently
change cosine ulps unless both engines narrow to FLOAT[] the way
Spark's conform narrows to array<float>. Int-width drift is
value-invisible (both engines surface Python ints) and DuckDB already
floors ns-parquet to µs TIMESTAMP at scan exactly like conform's
div-1000 — those casts are included anyway because they cost nothing
and make the guarantee uniform: whatever layout the round ships, both
engines compute on the declared contract types.

The rewriter understands the three lexical regions oracle SQL in this
repo uses — code, ``'...'`` literals (with ``''`` escapes) and ``--``
line comments — via a character scanner, NOT a regex over quotes: an
apostrophe inside a comment ("-- don't ...") must not flip literal
parity, and a WITH clause behind a leading comment must still merge.
Block comments are not scanned because no oracle uses them; a ``/*``
would simply be treated as code (and the parse gate in
tests/test_oracle_norm.py fails loudly if that ever produces bad SQL).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

from airflow_jira_etl_spark.catalog import SCHEMAS

# Every fixture table (== catalog.TABLES; asserted in tests so the two
# can never drift apart).
NORM_TABLES = (
    "lineitem",
    "orders",
    "customer",
    "supplier",
    "part",
    "nation",
    "region",
    "events",
    "documents",
    "embeddings",
)

_DUCK_TYPE = {
    T.LongType: "BIGINT",
    T.IntegerType: "INTEGER",
    T.DoubleType: "DOUBLE",
    T.StringType: "VARCHAR",
    T.TimestampType: "TIMESTAMP",
}


def _duck_type(dt: T.DataType) -> str:
    if isinstance(dt, T.ArrayType):
        return f"{_duck_type(dt.elementType)}[]"
    if isinstance(dt, T.FloatType):
        return "FLOAT"
    return _DUCK_TYPE[type(dt)]

_WITH = re.compile(r"WITH\s+(RECURSIVE\s+)?", re.IGNORECASE)


def scan_segments(sql: str) -> list[tuple[str, str]]:
    """Lex ``sql`` into ``(kind, text)`` segments, kind in
    {"code", "lit", "comment"}; concatenating texts reproduces the
    input exactly."""
    out: list[tuple[str, str]] = []
    i, start, state, n = 0, 0, "code", len(sql)

    def flush(upto: int, kind: str) -> None:
        nonlocal start
        if upto > start:
            out.append((kind, sql[start:upto]))
        start = upto

    while i < n:
        c = sql[i]
        if state == "code":
            if c == "'":
                flush(i, "code")
                state = "lit"
                i += 1
            elif c == "-" and sql[i : i + 2] == "--":
                flush(i, "code")
                state = "comment"
                i += 2
            else:
                i += 1
        elif state == "lit":
            if c == "'":
                if sql[i + 1 : i + 2] == "'":  # escaped quote
                    i += 2
                else:
                    i += 1
                    flush(i, "lit")
                    state = "code"
            else:
                i += 1
        else:  # comment — runs to end of line
            if c == "\n":
                flush(i, "comment")
                state = "code"
            else:
                i += 1
    flush(n, state)
    return out


def code_text(sql: str) -> str:
    """The code-only portion of ``sql`` (literals and comments
    stripped) — shared with the registry-coverage test so both sides
    agree on what counts as a table reference."""
    return "".join(s for k, s in scan_segments(sql) if k == "code")


def _contract_cte(table: str) -> str:
    cols = ", ".join(
        f"CAST({f.name} AS {_duck_type(f.dataType)}) AS {f.name}"
        for f in SCHEMAS[table].fields
    )
    return f"{table}__t AS (SELECT {cols} FROM {table})"


def drift_proof(sql: str) -> str:
    """Return ``sql`` with every fixture-table reference routed through
    a contract-typed CTE; unchanged when no fixture table is
    referenced."""
    segments = scan_segments(sql)
    code = [s for k, s in segments if k == "code"]
    referenced = [
        t
        for t in NORM_TABLES
        if any(re.search(rf"\b{t}\b", s, re.IGNORECASE) for s in code)
    ]
    if not referenced:
        return sql
    # Registration-time guard: the rewrite below renames EVERY bare
    # occurrence of a fixture-table word, so an oracle that reuses one
    # as its own alias ("AS part", "AS part(c1, ...)", the implicit
    # form "FROM orders part") or CTE name ("WITH events AS (") would
    # be silently rewritten into nonsense and surface only as a
    # confusing hash mismatch. Fail loudly at import instead.
    joined = " ".join(code)
    # tokens that LEGITIMATELY precede a fixture-table reference; a
    # fixture word preceded by anything else (another identifier, a
    # closing paren) is an alias in disguise — the implicit select-list
    # alias "SELECT x part" and the derived-table alias ") part" both
    # slipped the older FROM/JOIN-anchored patterns
    _ok_prev = {
        "FROM", "JOIN", "WITH", "RECURSIVE", "LATERAL", "TABLE", "INTO",
        "EXISTS", "IN", "SELECT", "WHERE", "AND", "OR", "ON", "BY",
        "ALL", "DISTINCT", "THEN", "ELSE", "WHEN", "CASE", "END",
        "UNION", "INTERSECT", "EXCEPT", "HAVING", "NOT",
    }
    for t in referenced:
        reused = (
            # explicit alias, with or without a column list
            re.search(rf"\bAS\s+{t}\b", joined, re.IGNORECASE)
            # CTE name, with or without a declared column list
            or re.search(
                rf"(?:\bWITH\b|,)\s*(?:RECURSIVE\s+)?{t}\s*"
                rf"(?:\([^)]*\))?\s+AS\s*\(",
                joined,
                re.IGNORECASE,
            )
            or any(
                m.group(1).upper() not in _ok_prev
                for m in re.finditer(
                    rf"([A-Za-z_]\w*|\))\s+{t}\b", joined, re.IGNORECASE
                )
            )
        )
        if reused:
            raise ValueError(
                f"oracle reuses fixture-table name {t!r} as an alias or "
                "CTE name; rename it (drift_proof would rewrite it)"
            )
    rewritten = []
    for kind, s in segments:
        if kind == "code":
            for t in referenced:
                s = re.sub(rf"\b{t}\b", f"{t}__t", s, flags=re.IGNORECASE)
        rewritten.append((kind, s))
    preamble = ", ".join(_contract_cte(t) for t in referenced)

    # Does the oracle's own statement start with WITH?  Find the first
    # non-whitespace CODE character (comments may precede it) and test
    # there; if so, splice the preamble into the existing WITH list,
    # keeping RECURSIVE immediately after the keyword.
    body = "".join(s for _, s in rewritten)
    pos = 0
    for kind, s in rewritten:
        if kind == "code" and s.strip():
            pos += len(s) - len(s.lstrip())
            break
        pos += len(s)
    m = _WITH.match(body, pos)
    if m:
        return body[: m.end()] + f"{preamble}, " + body[m.end() :]
    return f"WITH {preamble} {body}"
