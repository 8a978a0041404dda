"""Emit a driver-format correctness artifact for EVERY registered query.

Usage::

    python -m airflow_jira_etl_spark.tools.correctness_local \
        [sf_dir] [out.json]

The external driver sweep records only ~50 queries per round; this tool
runs the IDENTICAL differential check (tests/oracle_check.py — row
count, sorted column names, order-insensitive 4-dp value comparison)
over the full registry and writes one JSON object per query in the same
shape as ``CORRECTNESS_r{N}.json``, so out-of-window queries still
carry machine-checkable evidence in-repo.
"""

from __future__ import annotations

import json
import sys

from airflow_jira_etl_spark import registry
from airflow_jira_etl_spark.session import get_spark


def main(argv: list[str]) -> int:
    from tests.oracle_check import compare_detail, duckdb_conn

    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
    out_path = argv[2] if len(argv) > 2 else "CORRECTNESS_LOCAL.json"

    registry.load_all_queries()
    spark = get_spark("correctness-local")
    con = duckdb_conn(sf_dir)

    out: dict[str, dict] = {}
    n_bad = 0
    for name, fn in registry.QUERIES.items():
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            df = fn(spark, sf_dir)
            if name in registry.ORACLES:
                # the same comparison tests/test_oracle.py gates on
                d = compare_detail(df, con, registry.ORACLES[name])
                for k in (
                    "rows_match",
                    "schema_match",
                    "hash_match",
                    "spark_rows",
                    "oracle_rows",
                ):
                    rec[k] = d[k]
            else:
                rec["spark_rows"] = df.count()
                rec["err"] = "no_oracle"
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        # a few queries eager-cache their self-join inputs; without a
        # per-query clear the cached relations accumulate across the
        # 140+-query sweep. (bench.py deliberately does NOT clear
        # between measured queries — plan-identical caches are shared
        # across the LSH family there by design; here memory bounds
        # matter more than steady-state timing.) Guarded: if the
        # failing query KILLED the session (JVM OOM, dead Py4J
        # gateway), clearCache would raise OUTSIDE the per-query
        # except and abort the sweep with every completed result
        # unwritten — exactly the partial evidence the artifact exists
        # to preserve.
        try:
            spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001
            print(f"# clearCache failed after {name}: {exc}", file=sys.stderr)
        if rec["err"] not in (None, "no_oracle") or False in (
            rec["rows_match"],
            rec["schema_match"],
            rec["hash_match"],
        ):
            n_bad += 1
        out[name] = rec
        print(
            f"# {name}: hash={rec['hash_match']} err={rec['err']}",
            file=sys.stderr,
        )

    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {out_path}: {len(out)} queries, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
