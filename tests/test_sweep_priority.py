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


# Round-14 window plan: evidence tiers after the seventh consecutive
# fully-green driver round are r11:47, r12:50, r13:50. Candidates =
# 3 new never-checked queries + the 47-row r11 tier = 50 exactly — no
# oversubscription, so NO deferrals this round (see the derivation
# comment above registry.SWEEP_PRIORITY).
DEFERRED: set[str] = set()

# Evidence-age threshold for "must re-prove this round": the whole
# r11 tier fits the window, so everything at or below r11 must be
# inside it.
STALE_ROUND = 11

PROMOTED = {
    # round 14 (the advisor cannot see code changes):
    # - the three NEW queries, never driver-checked (also enforced by
    #   test_never_checked_queries_lead_the_window);
    # - llm_decontaminate: gram builder factored into the shared
    #   _doc_distinct_grams helper this round — already in-window via
    #   the r11 tier, so the code-recency re-proof costs nothing.
    # NOT promoted (documented demotion): llm_dedup_paragraph — its
    # r14 argmin runtime guard (ADVICE r13) is value-neutral for every
    # in-range corpus, pinned both ways by tests/test_paragraph_dedup
    # (in-range outputs unchanged at the 2^43-1 boundary, out-of-range
    # raises), and its driver row is r13-fresh; displacing an r11 row
    # would trade a stale re-proof for ~0 differential info gain.
    "llm_decontaminate_bloom",
    "llm_heavy_hitters",
    "llm_reservoir_sample",
    "llm_decontaminate",
}


def test_stale_evidence_queries_fill_the_window():
    """Every query whose latest driver evidence is at or below the
    stale threshold must be in the sweep window, except the explicitly
    documented deferrals — and ONLY those may be deferred (no silent
    displacement)."""
    ev = evidence_by_query(REPO)
    order = list(registry.QUERIES)
    window = set(order[:SWEEP_WINDOW])
    stale = {n for n in order if n in ev and ev[n][0] <= STALE_ROUND}
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


def test_every_registered_query_has_an_oracle():
    """Round 7 converted the last rows-only queries to hash-checkable
    oracles; the driver has no rows-only mode (records err=no_oracle),
    so a new oracle-less registration would silently forfeit its
    correctness evidence. Engine-specific outputs belong behind a
    boolean-contract oracle (see agg_approx_distinct /
    llm_sim_ivf_topk), not behind a missing one."""
    missing = sorted(set(registry.QUERIES) - set(registry.ORACLES))
    assert not missing, f"queries without a SQL oracle: {missing}"
