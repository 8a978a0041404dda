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


# Round-12 window plan: 56 must-prove candidates (the two r11
# deferrals with r07 rows, the 49-query r09 tier, and five
# code-recency promotions for the cosine ladder's NaN rung) for 50
# slots; these six are the documented deferrals (weakest differential
# info gain, code unchanged since their green rows — see the
# derivation comment above registry.SWEEP_PRIORITY). Everything else
# stale must be inside the window.
DEFERRED = {
    "fn_bitwise_suite",  # exact-integer ops; timestamp sibling stays
    "fn_hash_suite",  # deterministic hash contract, unchanged
    "scan_csv",  # format scan unchanged; scan_jsonl keeps the seat
    "mm_resize_batch",  # kernel plumbing unchanged; sample_frames stays
    "report_monthly_growth",  # SQL-mirror report; 8 siblings stay
    "win_lag_lead",  # simple offset windows; 4 siblings stay
}

# Evidence-age threshold for "must re-prove this round": after the
# fully-green r11, the oldest tiers are r07 (the two old deferrals)
# and r09.
STALE_ROUND = 9

PROMOTED = {
    # code-recency promotions, round 12:
    # - sink_scd2_apply: the scd2 merge body was rewritten (one-pass
    #   explode form, pure equi probe — operators/scd2.py); already
    #   in-window via the r09 tier, pinned here so a future reshuffle
    #   cannot forget the code recency;
    # - the five similarity consumers whose driver rows predate the
    #   cosine guard ladder's NaN rung (functions/similarity.py) and
    #   the IVF indexable predicate change.
    "sink_scd2_apply",
    "llm_sim_topk",
    "llm_sim_lsh_topk",
    "llm_sim_pairs_threshold",
    "llm_sim_ivf_topk",
    "llm_dedup_semantic_clusters",
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
