"""DuckDB-side oracle determinism scan over a (poisoned) fixture.

Round-13 origin: the report_monthly_growth drift flake was not an
ordering-convention gap but a DuckDB 1.0.0 RACE — the NULL-group row
of a threaded hash aggregate with a date_trunc group key reads a
garbage key when it flows into a window (~40% of runs on that shape;
NULLS qualifiers and COALESCE-sentinel sort keys don't help). A flaky
ORACLE is strictly worse than a red one: it passes the committed run
and reds a later identical one. This tool makes oracle-side
nondeterminism directly measurable: it executes every registered
oracle N times against one fixture directory and reports any query
whose NaN-normalized result multiset varies across runs.

Usage::

    python -m airflow_jira_etl_spark.tools.oracle_determinism \
        [fixture_dir] [runs]

``fixture_dir`` defaults to /root/testdata/sf0.01; pass a
drift-poisoned copy (tests/test_value_drift_sweep.py builds one) to
scan under NULL/NaN/Inf content, where the known race classes live.
Exit code 1 if any oracle is nondeterministic.

The per-run comparison is NaN-aware: poisoned measure columns
legitimately carry NaN, and ``nan != nan`` would make every run look
distinct (the exact trap that initially hid the monthly_growth root
cause behind 20-of-20 "distinct" results).
"""

from __future__ import annotations

import math
import sys


def _norm(rows: list[tuple]) -> tuple:
    return tuple(
        sorted(
            (
                tuple(
                    "NAN" if isinstance(v, float) and math.isnan(v) else str(v)
                    for v in r
                )
                for r in rows
            ),
            key=str,
        )
    )


def main(argv: list[str]) -> int:
    from airflow_jira_etl_spark import registry
    from tests.oracle_check import duckdb_conn

    fixture = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
    runs = int(argv[2]) if len(argv) > 2 else 6

    registry.load_all_queries()
    con = duckdb_conn(fixture)
    flaky: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name, sql in sorted(registry.ORACLES.items()):
        try:
            seen = {_norm(con.execute(sql).fetchall()) for _ in range(runs)}
        except Exception as exc:  # noqa: BLE001 — report, keep scanning
            errors[name] = repr(exc)[:160]
            continue
        if len(seen) > 1:
            flaky[name] = len(seen)
            print(f"FLAKY {name}: {len(seen)} distinct results / {runs} runs")
    for name, err in errors.items():
        print(f"ERROR {name}: {err}")
    print(
        f"-- {len(registry.ORACLES)} oracles x {runs} runs on {fixture}: "
        f"{len(flaky)} flaky, {len(errors)} errored"
    )
    return 1 if flaky or errors else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
