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


# Round-6 window plan: 57 must-prove candidates for 50 slots; these 6
# are the documented deferrals (weakest info gain — see the derivation
# comment above registry.SWEEP_PRIORITY). Everything else with r01/r02
# evidence, the red row, and the 4 promoted sink/mm queries must be
# inside the window.
DEFERRED = {
    "flagship_revenue_by_nation",  # driver's entry() smoke runs it anyway
    "llm_sim_ivf_topk",  # rows-only by design: no hash evidence to gain
    "report_forecast_revenue_change",
    "report_local_supplier_volume",
    "report_market_share",
    "report_top_parts_per_brand",
}

PROMOTED = {
    # SQL oracles added in round 5; only rows-only r04 driver rows exist
    "sink_create_table",
    "mm_decode_features",
    "mm_sample_frames",
    # merge path changed r4/r5 (bucketer fingerprint, vacuum manifest)
    "sink_upsert",
}


def test_stale_evidence_queries_fill_the_window():
    """Every query whose latest driver evidence is r01/r02 must be in
    the sweep window, except the explicitly documented deferrals — and
    ONLY those may be deferred (no silent displacement)."""
    ev = evidence_by_query(REPO)
    order = list(registry.QUERIES)
    window = set(order[:SWEEP_WINDOW])
    stale = {n for n in order if n in ev and ev[n][0] <= 2}
    deferred_out = stale - window
    assert deferred_out == (DEFERRED & stale), (
        f"undocumented stale-evidence deferrals: {deferred_out - DEFERRED}"
    )


def test_promoted_queries_in_window():
    """Queries promoted for code/oracle recency (the advisor cannot see
    code changes) must sit inside the window."""
    order = list(registry.QUERIES)
    window = set(order[:SWEEP_WINDOW])
    missing = PROMOTED - window
    assert not missing, f"promoted queries outside the window: {missing}"


def test_advisor_covers_registry():
    ev = evidence_by_query(REPO)
    # artifacts may mention queries that were renamed away; but every
    # CURRENT query either has evidence or is queued in the window
    # (checked above). Sanity: the advisor parses every artifact row.
    assert len(ev) >= 50
