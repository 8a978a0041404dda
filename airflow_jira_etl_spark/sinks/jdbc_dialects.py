"""Keyed-upsert SQL generation for the three reference dialects.

The reference ships one upsert implementation per database
(``/root/reference/dags/jira/db_ops.py``): Postgres
``INSERT ... ON CONFLICT DO UPDATE`` (:29-43), MySQL
``INSERT ... ON DUPLICATE KEY UPDATE`` (:56-70), MSSQL ``MERGE INTO``
(:83-100) — the MSSQL one is broken as written (the statement binds 2n
placeholders but supplies n values; SURVEY.md §2A/A10). Here the SQL
is generated once per (table, columns, key) and executed batched
(``executemany`` over whole partitions) instead of the reference's one
round-trip per row — the write pattern its own BASELINE flags as the
anti-pattern.

No database drivers exist in this environment, so execution is gated
behind an import-try (``write_upsert_jdbc``); the SQL generators are
fully unit-tested, and the distributed merge semantics they defer to
are the same last-writer-wins contract as operators/upsert.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

# Per-dialect identifier quoting. NOT optional: the reference's own
# Jira schema has a column literally named ``key``
# (``db_ops.py``/``jira_base_processor.py``), which is a RESERVED word
# in MySQL and T-SQL — unquoted, the generated statement is a syntax
# error on exactly the reference's workload. Table names quote per
# dot-segment so schema-qualified targets ('dbo.issues') stay valid.
# Each dialect's closing quote char is escaped by DOUBLING it (the
# standard rule in all three dialects): without it an identifier that
# CONTAINS the quote char ('a"b', 'a`b', 'a]b' — all legal column
# names) terminates the quoted region early, which is malformed SQL at
# best and an identifier-injection vector at worst.
_QUOTES = {"postgres": ('"', '"'), "mysql": ("`", "`"), "mssql": ("[", "]")}


def _q(dialect: str, ident: str, marker: str = "%s") -> str:
    open_q, close_q = _QUOTES[dialect]
    quoted = f"{open_q}{ident.replace(close_q, close_q * 2)}{close_q}"
    if marker == "%s":
        # format-paramstyle drivers (psycopg2/pymysql/pymssql) scan the
        # WHOLE statement for %-markers client-side, quoting included —
        # an identifier containing '%' ('100%sales') reads as a bogus
        # placeholder (or 'unsupported format character') at
        # executemany. Literal '%' must ship as '%%' under this
        # paramstyle; qmark drivers (pyodbc) do no %-interpolation, so
        # there the identifier stays verbatim.
        quoted = quoted.replace("%", "%%")
    return quoted


def _q_table(dialect: str, table: str, marker: str = "%s") -> str:
    return ".".join(_q(dialect, seg, marker) for seg in table.split("."))


def postgres_upsert_sql(
    table: str, columns: Sequence[str], key: str, marker: str = "%s"
) -> str:
    """INSERT ... ON CONFLICT (key) DO UPDATE SET c = EXCLUDED.c.
    A key-only table degrades to DO NOTHING — an empty SET list is a
    syntax error at execute time."""
    q = lambda c: _q("postgres", c, marker)  # noqa: E731
    cols = ", ".join(q(c) for c in columns)
    ph = ", ".join([marker] * len(columns))
    sets = ", ".join(
        f"{q(c)} = EXCLUDED.{q(c)}" for c in columns if c != key
    )
    action = f"DO UPDATE SET {sets}" if sets else "DO NOTHING"
    return (
        f"INSERT INTO {_q_table('postgres', table, marker)} ({cols}) "
        f"VALUES ({ph}) ON CONFLICT ({q(key)}) {action}"
    )


def mysql_upsert_sql(
    table: str, columns: Sequence[str], key: str, marker: str = "%s"
) -> str:
    """INSERT ... ON DUPLICATE KEY UPDATE c = VALUES(c). A key-only
    table degrades to the idempotent no-op assignment ``key = key``
    (MySQL has no DO NOTHING form; an empty UPDATE list is a syntax
    error)."""
    q = lambda c: _q("mysql", c, marker)  # noqa: E731
    cols = ", ".join(q(c) for c in columns)
    ph = ", ".join([marker] * len(columns))
    # VALUES(col) is deprecated since MySQL 8.0.20 (warns per statement)
    # in favor of the `AS new ... = new.col` row alias — but the alias
    # form is a SYNTAX ERROR on every server before 8.0.19, while
    # VALUES() still executes on all current versions. The reference
    # targets an unspecified MySQL (db_ops.py:56-70 uses VALUES());
    # keeping the universally-valid form is the compatibility call,
    # revisit when 9.x removes it.
    sets = ", ".join(f"{q(c)} = VALUES({q(c)})" for c in columns if c != key)
    return (
        f"INSERT INTO {_q_table('mysql', table, marker)} ({cols}) "
        f"VALUES ({ph}) "
        f"ON DUPLICATE KEY UPDATE {sets or f'{q(key)} = {q(key)}'}"
    )


def mssql_upsert_sql(
    table: str, columns: Sequence[str], key: str, marker: str = "%s"
) -> str:
    """MERGE INTO with a VALUES source row. One placeholder per column,
    referenced via the source alias everywhere — unlike the reference's
    version, which emits placeholders in both the UPDATE and INSERT
    branches and therefore binds 2n parameters for n values
    (``db_ops.py:92,97`` vs ``:89,98``); this generator fixes that."""
    q = lambda c: _q("mssql", c, marker)  # noqa: E731
    cols = ", ".join(q(c) for c in columns)
    ph = ", ".join([marker] * len(columns))
    src_cols = ", ".join(f"src.{q(c)}" for c in columns)
    sets = ", ".join(
        f"target.{q(c)} = src.{q(c)}" for c in columns if c != key
    )
    # key-only table: drop the WHEN MATCHED clause entirely (an empty
    # SET list is a syntax error; there is nothing to update)
    matched = f"WHEN MATCHED THEN UPDATE SET {sets} " if sets else ""
    return (
        f"MERGE INTO {_q_table('mssql', table, marker)} AS target "
        f"USING (VALUES ({ph})) AS src ({cols}) "
        f"ON target.{q(key)} = src.{q(key)} "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({src_cols});"
    )


_DIALECTS = {
    "postgres": postgres_upsert_sql,
    "mysql": mysql_upsert_sql,
    "mssql": mssql_upsert_sql,
}

# Default ceiling on concurrent JDBC write partitions (= connections):
# wide enough for real parallel-write throughput, under the strictest
# common server ceiling (Postgres ships max_connections=100). See the
# write_upsert_jdbc docstring.
_DEFAULT_MAX_WRITE_PARTITIONS = 64

# DBAPI paramstyles the executors' driver may use: the generators emit
# 'format' (%s — psycopg2, pymysql, pymssql) by default; 'qmark' (?)
# covers pyodbc, the dominant MSSQL driver. The marker is threaded
# INTO the generators rather than textually substituted afterwards — a
# post-hoc ``sql.replace("%s", "?")`` would also rewrite a '%s'
# sequence INSIDE a quoted identifier (a column named '100%sales'
# becomes '100?ales': a nonexistent column plus a phantom placeholder
# that shifts every later binding).
_PARAMSTYLES = {"format": "%s", "qmark": "?"}


def upsert_sql(
    dialect_or_conn_id: str,
    table: str,
    columns: Sequence[str],
    key: str,
    paramstyle: str = "format",
) -> str:
    """Dialect factory (reference A12, ``db_ops.py:102-112``): route a
    dialect name or a conn-id-style prefix ('postgres_default', ...) to
    its generator; ``paramstyle`` matches the executor driver's DBAPI
    paramstyle ('format' for psycopg2/pymysql/pymssql, 'qmark' for
    pyodbc)."""
    prefix = dialect_or_conn_id.split("_")[0].lower()
    try:
        marker = _PARAMSTYLES[paramstyle]
    except KeyError:
        raise ValueError(
            f"unsupported paramstyle {paramstyle!r}; "
            f"expected one of {sorted(_PARAMSTYLES)}"
        ) from None
    try:
        gen = _DIALECTS[prefix]
    except KeyError:
        raise ValueError(
            f"unsupported dialect {dialect_or_conn_id!r}; "
            f"expected prefix in {sorted(_DIALECTS)}"
        ) from None
    return gen(table, columns, key, marker=marker)


def write_upsert_jdbc(
    df: DataFrame,
    dialect: str,
    table: str,
    key: str,
    connect,  # () -> DBAPI connection
    batch_size: int = 1000,
    ordinal_col: str | None = None,
    num_partitions: int | None = None,
    paramstyle: str = "format",
) -> None:
    """Distributed batched upsert: each partition opens one connection
    and executes the dialect upsert with ``executemany`` per
    ``batch_size`` rows (vs the reference's per-row execute+commit).

    The batch is DEDUPED to one last-writer-wins row per key (the
    operators/upsert semantics; pass ``ordinal_col`` for an explicit
    intra-batch order) and REPARTITIONED by key before the write: raw
    foreachPartition would let two executors upsert the same absent
    key concurrently — a primary-key violation on MSSQL's MERGE (no
    HOLDLOCK) and a scheduling-dependent winner everywhere else.

    Connection economy: the key repartition width is ``num_partitions``
    when given (must be >= 1 — 0/negative raise rather than silently
    falling back), else ``max(sparkContext.defaultParallelism,
    spark.sql.shuffle.partitions)`` CAPPED at
    ``_DEFAULT_MAX_WRITE_PARTITIONS``. Both terms matter: under dynamic
    allocation defaultParallelism reflects only currently-REGISTERED
    cores (calling this before executors ramp up would collapse a
    large batch to ~2 serialized connections), while shuffle.partitions
    is a static config that survives ramp-up. The cap is the scale
    guard: on a 1000-executor cluster the uncapped width would open
    thousands of concurrent connections — past the strictest common
    server default (Postgres ships max_connections=100) the writes
    FAIL, and a database gains little write throughput past a few
    dozen concurrent sessions anyway (Spark's own JDBC writer bounds
    connections the same way, via its numPartitions option +
    coalesce). Each task still peeks its iterator before ``connect()``
    — empty partitions open no connection, so over-width within the
    cap costs only empty-task overhead, never idle connections; total
    connections are bounded by ``min(width, |distinct keys|)``. Both
    width sources are read without touching the input plan: the
    previous ``df.rdd.getNumPartitions()`` probe forced RDD
    conversion, which under AQE finalizes the physical plan and can
    execute the input's upstream shuffle stages once just to read a
    partition count, then again for the actual write. The database's
    connection ceiling, not Spark's shuffle width, is the scarce
    resource at a JDBC sink; pass ``num_partitions`` explicitly to
    pin it (in either direction) when the target's ceiling is known.

    Requires a DBAPI driver on the executors; none ships in this
    environment, so tests exercise the full partition-write path with
    a recording fake DBAPI connection (test_jdbc_dialects)."""
    from pyspark.sql import functions as F

    from airflow_jira_etl_spark.operators.upsert import upsert

    deduped = upsert(df.limit(0), df, key, ordinal_col=ordinal_col)
    if num_partitions is not None:
        if num_partitions < 1:
            raise ValueError(
                f"num_partitions must be >= 1, got {num_partitions}"
            )
        n_parts = num_partitions
    else:
        spark = df.sparkSession
        n_parts = min(
            max(
                spark.sparkContext.defaultParallelism,
                int(spark.conf.get("spark.sql.shuffle.partitions")),
            ),
            _DEFAULT_MAX_WRITE_PARTITIONS,
        )
    df = deduped.repartition(n_parts, F.col(key))
    columns = df.columns
    key_idx = columns.index(key)
    sql = upsert_sql(dialect, table, columns, key, paramstyle=paramstyle)

    def write_partition(rows) -> None:
        rows = iter(rows)
        try:
            first = next(rows)
        except StopIteration:
            return  # empty partition: no connection, no round-trip

        def check(row) -> tuple:
            # Executor-side BACKSTOP: operators/upsert's inline
            # _null_key_guard already raises on NULL batch keys during
            # the dedup stage, so under the current wiring no NULL key
            # reaches this partition. The per-row branch stays anyway —
            # a database write is the one boundary where defense in
            # depth is worth one comparison per row, because the
            # failure it prevents is not an error but silent growth:
            # the conflict clause never matches a NULL (unique indexes
            # treat NULLs as distinct), so every RETRY of a NULL-key
            # batch would INSERT a fresh row — breaking exactly the
            # replay the idempotency contract promises is safe.
            t = tuple(row)
            if t[key_idx] is None:
                raise ValueError(
                    f"NULL {key!r} in upsert batch — keys must be "
                    f"non-null (a NULL key is collapsed by the dedup "
                    f"and never matches the conflict clause, so "
                    f"replays would duplicate rows)"
                )
            return t

        conn = connect()
        try:
            cur = conn.cursor()
            batch = [check(first)]
            for row in rows:
                batch.append(check(row))
                if len(batch) >= batch_size:
                    cur.executemany(sql, batch)
                    batch.clear()
            if batch:
                cur.executemany(sql, batch)
            conn.commit()
        finally:
            conn.close()

    df.foreachPartition(write_partition)
