"""Mechanical sweep-order derivation from the driver's artifacts.

The external correctness sweep records only the first ~50 registered
queries per round, so ``registry.SWEEP_PRIORITY`` must keep every
query's differential evidence fresh: least-recently-checked first,
never-checked first of all. Hand-maintaining that list rots; this
advisor derives the order from the ``CORRECTNESS_r*.json`` artifacts
so each round's reordering is a diff against evidence, not memory.

Usage::

    python -m airflow_jira_etl_spark.tools.sweep_advisor [repo_root]

prints one line per registered query: suggested rank, name, the last
round with a driver row, and whether that row was green. Queries whose
code changed after their last driver row still belong in tier A — the
advisor cannot see code recency, so treat its output as the BASE
order and promote code-changed queries by hand (documented in the
registry's tier comments).
"""

from __future__ import annotations

import glob
import json
import os
import sys


def evidence_by_query(repo_root: str) -> dict[str, tuple[int, bool]]:
    """query -> (latest round with a driver row, row was green).

    A green SQL row = rows+schema+hash all true; a rows-only row (err
    == 'no_oracle') counts as green — it is the strongest check the
    driver records for that query.
    """
    ev: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as f:
            rows = json.load(f)
        for name, r in rows.items():
            if r.get("err") == "no_oracle":
                green = r.get("spark_rows") is not None
            else:
                green = bool(
                    r.get("rows_match")
                    and r.get("schema_match")
                    and r.get("hash_match")
                )
            ev[name] = (rnd, green)  # later files overwrite: latest wins
    return ev


def suggested_order(
    registered: list[str], ev: dict[str, tuple[int, bool]]
) -> list[tuple[str, int | None, bool | None]]:
    """Registered queries ordered least-recently-evidenced first:
    never-checked (round None), then red rows (must re-prove), then by
    ascending evidence round; name-sorted within a class for a stable
    diff."""

    def key(name: str):
        if name not in ev:
            return (0, 0, name)  # never checked — first
        rnd, green = ev[name]
        return (1 if not green else 2, rnd, name)

    out = []
    for name in sorted(registered, key=key):
        rnd, green = ev.get(name, (None, None))
        out.append((name, rnd, green))
    return out


def main() -> None:
    repo_root = sys.argv[1] if len(sys.argv) > 1 else os.getcwd()
    sys.path.insert(0, repo_root)
    from airflow_jira_etl_spark import registry

    # the sys.path insert cannot re-route an ALREADY-imported package:
    # running `python -m airflow_jira_etl_spark.tools.sweep_advisor
    # /other/repo` from repo A imports A's registry regardless, and
    # the output would silently rank B's evidence artifacts against
    # A's query set (B-checked queries green, A-only queries
    # never-checked). Refuse the mismatch instead of lying.
    pkg_root = os.path.dirname(
        os.path.dirname(os.path.abspath(registry.__file__))
    )
    if os.path.realpath(pkg_root) != os.path.realpath(repo_root):
        raise SystemExit(
            f"sweep_advisor: evidence root {repo_root!r} is not the "
            f"repo this package was imported from ({pkg_root!r}) — "
            f"run the tool from inside the target repo"
        )
    registry.load_all_queries()
    ev = evidence_by_query(repo_root)
    for rank, (name, rnd, green) in enumerate(
        suggested_order(list(registry.QUERIES), ev), 1
    ):
        status = (
            "never-checked"
            if rnd is None
            else f"r{rnd:02d} {'green' if green else 'RED'}"
        )
        print(f"{rank:3d}  {name:35s} {status}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into head
        pass
