"""Driver-parity oracle sweep at any SF directory.

Usage::

    python -m airflow_jira_etl_spark.tools.oracle_sweep [sf_dir] [name ...]

Runs every registered query (or just the named ones) against its DuckDB
oracle with the exact canonicalization the driver uses (see
``tests/oracle_check.py``), defaulting to the driver's sf0.01 rather
than the test suite's sf0.001 — scale-dependent mismatches (ordering
ties, unit drift in regenerated fixtures) only show up here.  Prints a
one-line verdict per query and exits non-zero if any query fails.
"""

from __future__ import annotations

import sys
import time

from airflow_jira_etl_spark import registry
from airflow_jira_etl_spark.session import get_spark


def main(argv: list[str]) -> int:
    from tests.oracle_check import compare, duckdb_conn

    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
    only = set(argv[2:])

    registry.load_all_queries()
    unknown = only - set(registry.QUERIES)
    if unknown:  # a typo must not read as a green empty sweep
        print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
        return 2
    spark = get_spark("oracle-sweep")
    con = duckdb_conn(sf_dir)

    names = [n for n in registry.QUERIES if not only or n in only]
    bad = 0
    for name in names:
        t0 = time.time()
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            if name in registry.ORACLES:
                rep = compare(df, con, registry.ORACLES[name])
                ok = not rep["errors"]
                msg = "" if ok else str(rep["errors"])[:300]
            else:
                n_rows = df.count()
                ok, msg = n_rows >= 0, f"rows_only n={n_rows}"
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"EXC {type(exc).__name__}: {exc}"[:300]
        finally:
            # a few builders cache+eagerly fill shared self-join inputs;
            # across 146 queries those relations would otherwise pile up
            # until LRU eviction (same hygiene as correctness_local/bench)
            spark.catalog.clearCache()
        bad += 0 if ok else 1
        print(
            f"{'OK ' if ok else 'BAD'} {time.time() - t0:6.2f}s {name} {msg}",
            flush=True,
        )

    print(f"done: {len(names)} queries, {bad} bad")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
