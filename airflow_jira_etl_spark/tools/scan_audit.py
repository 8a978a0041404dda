"""Registry-wide physical-plan audit: scan multiplicity and join shape.

Round 12 found the SCD2 merge's "one pass over the dimension" was
physically FIVE FileScans — each union branch re-executed the
unexchanged broadcast join (Spark's ReuseExchange shares exchanges
across branches, never bare scans). That class of defect is invisible
to correctness oracles and to wall-clock at test scale (page-cached
re-scans are nearly free locally) but multiplies I/O at 100 TB. This
tool makes the class auditable for EVERY registered query:

    python -m airflow_jira_etl_spark.tools.scan_audit [sf_dir] [-v]

For each query it builds the DataFrame (no collect — but queries that
materialize during build, e.g. streaming or localCheckpoint-backed
ones, do run), then reports from the executed plan:

  scans      total FileScan operators
  tables     distinct parquet locations scanned
  mult       scans / tables — the re-execution smell (1.0 is ideal;
             >1 is only LEGITIMATE when the query's semantics read a
             table twice, e.g. self-joins or set ops on one table)
  smj / bnl / cart / xchg / reuse
             SortMergeJoin / BroadcastNestedLoopJoin /
             CartesianProduct / hash exchanges / reused exchanges

Output is sorted by mult descending so the audit surface is the top
of the list. Queries the harness cannot plan without a sink (pure
write-path queries) are reported as build errors, not skipped
silently.
"""

from __future__ import annotations

import re
import sys

from airflow_jira_etl_spark.session import get_spark

_LOC = re.compile(r"Location: \w+(?:\([^)]*\))?\[([^\],]*)")


def _marker_col(line: str) -> int | None:
    """Tree depth of a plan line = column of its branch marker."""
    for mk in ("+- ", ":- "):
        i = line.find(mk)
        if i >= 0:
            return i
    return None


def audit_plan(plan: str) -> dict:
    """Counts REAL FileScans only: a cached frame's InMemoryRelation
    prints its build plan inline (the minhash family shows 8 FileScan
    lines for a plan that executes ZERO file reads — all inside cached
    subtrees), so FileScan lines indented under an InMemoryRelation are
    classified as cached_scans, not scans. Region tracking is by
    branch-marker column: lines deeper than the relation's marker
    belong to its (printed, not executed) build plan."""
    real, cached = [], 0
    cache_depth: list[int] = []  # stack of InMemoryRelation columns
    for line in plan.splitlines():
        col = _marker_col(line)
        if col is None:
            col = len(line) - len(line.lstrip(" :"))
        while cache_depth and col <= cache_depth[-1]:
            cache_depth.pop()
        if "InMemoryRelation" in line:
            cache_depth.append(col)
            continue
        if "FileScan" in line:
            if cache_depth:
                cached += 1
            else:
                m = _LOC.search(line)
                real.append(m.group(1).strip() if m else "?")
    tables = len(set(real))
    return {
        "scans": len(real),
        "cached_scans": cached,
        "tables": tables,
        "mult": round(len(real) / tables, 2) if tables else 0.0,
        "imts": plan.count("InMemoryTableScan"),
        "smj": plan.count("SortMergeJoin"),
        "bnl": plan.count("BroadcastNestedLoopJoin"),
        "cart": plan.count("CartesianProduct"),
        "xchg": plan.count("Exchange hashpartitioning"),
        "reuse": plan.count("ReusedExchange"),
    }


def main(argv: list[str]) -> int:
    from airflow_jira_etl_spark import registry

    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
    verbose = "-v" in argv
    registry.load_all_queries()
    spark = get_spark("scan-audit")

    rows = []
    errors = []
    for name, fn in registry.QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            errors.append((name, repr(exc)[:120]))
            continue
        rows.append((name, audit_plan(plan)))
        spark.catalog.clearCache()

    rows.sort(key=lambda r: (-r[1]["mult"], -r[1]["scans"], r[0]))
    print(
        f"{'query':38s} {'scans':>5} {'tables':>6} {'mult':>5} "
        f"{'imts':>4} {'smj':>4} {'bnl':>4} {'cart':>4} {'xchg':>4} "
        f"{'reuse':>5}"
    )
    for name, a in rows:
        if not verbose and a["mult"] <= 1.0 and not (
            a["smj"] or a["bnl"] or a["cart"]
        ):
            continue
        print(
            f"{name:38s} {a['scans']:5d} {a['tables']:6d} "
            f"{a['mult']:5.2f} {a['imts']:4d} {a['smj']:4d} "
            f"{a['bnl']:4d} {a['cart']:4d} {a['xchg']:4d} "
            f"{a['reuse']:5d}"
        )
    n_flagged = sum(1 for _, a in rows if a["mult"] > 1.0)
    print(
        f"-- {len(rows)} audited, {n_flagged} with scan multiplicity "
        f"> 1, {len(errors)} build errors"
    )
    for name, err in errors:
        print(f"ERROR {name}: {err}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
