"""Sweep-order invariants: the external correctness sweep records only
the first ~50 registered queries, so the priority list must put the
queries with the weakest evidence inside that window."""

from __future__ import annotations

import os

from airflow_jira_etl_spark import registry
from airflow_jira_etl_spark.tools.sweep_advisor import evidence_by_query

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP_WINDOW = 50

registry.load_all_queries()


def test_never_checked_queries_lead_the_window():
    """Every query with NO driver row in any CORRECTNESS artifact must
    sit inside the sweep window — otherwise it can never gain first
    evidence."""
    ev = evidence_by_query(REPO)
    order = list(registry.QUERIES)
    window = set(order[:SWEEP_WINDOW])
    never = [n for n in order if n not in ev]
    missing = [n for n in never if n not in window]
    assert not missing, (
        f"never-driver-checked queries outside the {SWEEP_WINDOW}-slot "
        f"window: {missing}"
    )


def test_red_rows_lead_the_window():
    """Any query whose LATEST driver row is red must be re-proved this
    round — it has to be inside the sweep window."""
    ev = evidence_by_query(REPO)
    order = list(registry.QUERIES)
    window = set(order[:SWEEP_WINDOW])
    red = [n for n, (rnd, green) in ev.items() if not green and n in registry.QUERIES]
    missing = [n for n in red if n not in window]
    assert not missing, f"red-evidence queries outside the window: {missing}"


def test_advisor_covers_registry():
    ev = evidence_by_query(REPO)
    # artifacts may mention queries that were renamed away; but every
    # CURRENT query either has evidence or is queued in the window
    # (checked above). Sanity: the advisor parses every artifact row.
    assert len(ev) >= 50
