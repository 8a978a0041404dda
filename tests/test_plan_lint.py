"""Whole-registry physical-plan lint: scale anti-patterns must not
appear in ANY registered query's executed plan, not just the few with
hand-written plan guards.

Three anti-patterns are linted:

- ``CartesianProduct`` — an unbroadcast cross join shuffles |A|x|B|
  at cluster scale; every deliberate no-equi-key join in the engine is
  a BroadcastNestedLoopJoin instead.
- ``BatchEvalPython`` (row-at-a-time Python UDF) — only the explicit
  API-parity surface (udf_python_scalar, udtf_explode_kv's UDTF) may
  pay the per-row Python round-trip; everything else must stay JVM or
  Arrow-batched.
- un-partitioned ``Window`` — a Window node with an empty partition
  spec serializes its entire input through ONE task. Since round 9 the
  fact-scale global ranks go through the distributed two-phase ranker
  (operators/ranking.py); since round 13 the allowlist is EMPTY — the
  last survivor (report_monthly_growth's |months| lag) now partitions
  on (month IS NULL), which both isolates the NULL bucket from the
  chain and clears the lint. Node format: ``Window [funcs],
  [partSpec], [orderSpec]`` — two top-level bracket groups instead of
  three means no partition spec.

Sink/stream/source queries are excluded: building their DataFrame runs
real side effects (streams, table writes), and the returned batch
DataFrame's plan is a trivial read of the result, not the interesting
pipeline (their plan shapes are asserted by dedicated tests).

Note: the ranking-backed queries (sort_multi_key, win_ntile_percent,
agg_exact_quantiles, llm_corpus_stats) are NOT side-effect-free to
build — operators/ranking.py runs its counts pass (a shuffle + a
k-bounded collect) eagerly so the offsets can ship as plan literals.
That is compute, not state mutation, so they stay linted; it just
makes this sweep cost a few real jobs.
"""

from __future__ import annotations

import pytest

from airflow_jira_etl_spark import registry

registry.load_all_queries()

_EXCLUDED_PREFIXES = ("stream_", "sink_", "source_", "mv_", "cdc_")
_ROW_UDF_ALLOWED = {"udf_python_scalar", "udtf_explode_kv"}
# empty since round 13 (report_monthly_growth's |months| lag now
# partitions on (month IS NULL)); a future entry needs an
# output-sized-frame justification reviewed in PLANS.md
_GLOBAL_WINDOW_ALLOWED: set[str] = set()


def _unpartitioned_window_lines(plan: str) -> list[str]:
    """Window plan lines with only two top-level bracket groups —
    [funcs], [order] — i.e. no partition spec."""
    bad = []
    for line in plan.splitlines():
        body = line.lstrip(" +-:*()0123456789")
        if not body.startswith("Window ["):
            continue
        depth = 0
        groups: list[str] = []
        for ch in line:
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            elif ch == "]":
                depth -= 1
            elif depth > 0:
                groups[-1] += ch
        # [funcs], [partSpec], [orderSpec] = partitioned+ordered;
        # [funcs], [partSpec] (no ASC/DESC) = partition-only full-frame
        # agg — both fine. Two groups where the SECOND is an order spec
        # means the partition spec is empty: single-task.
        if len(groups) < 3 and (
            " ASC" in groups[-1] or " DESC" in groups[-1]
        ):
            bad.append(line.strip())
    return bad

LINTED = [
    n
    for n in registry.QUERIES
    if not n.startswith(_EXCLUDED_PREFIXES)
]


@pytest.mark.parametrize("name", LINTED)
def test_no_scale_antipatterns_in_plan(name, spark, sf_dir):
    df = registry.QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"
    if name not in _ROW_UDF_ALLOWED:
        assert "BatchEvalPython" not in plan, (
            f"{name}: row-at-a-time Python UDF outside the deliberate "
            f"API-parity surface\n{plan}"
        )
    if name not in _GLOBAL_WINDOW_ALLOWED:
        bad = _unpartitioned_window_lines(plan)
        assert not bad, (
            f"{name}: un-partitioned Window (single-task at scale): {bad}"
        )


def test_no_bare_persist_in_engine_source():
    """Source lint (round 11): `.persist(` is BANNED in engine source.
    Twice this engine shipped a two-pass operator whose driver-side
    bookkeeping silently desynced from a RECOMPUTED second pass — a
    persisted frame recomputes through its (re-sampling or
    nondeterministic) lineage on block loss or cache clearing, which is
    exactly when the bookkeeping's coordinates stop describing the data
    (operators/ranking.py round 11, sinks/parquet_upsert.py round 11).
    Cross-pass materialization must use localCheckpoint (lineage
    truncation: recompute impossible, loss loud). Read-once `.cache()`
    over DETERMINISTIC expressions remains fine and is not linted; a
    genuinely safe future persist belongs in the allowlist with a
    reviewed justification."""
    import os
    import re

    allow: set[str] = set()  # (path, lineno) pairs, justified in review
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "airflow_jira_etl_spark",
    )
    hits = []
    for dirpath, _, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    code = line.split("#", 1)[0]
                    if re.search(r"\.persist\(", code):
                        rel = os.path.relpath(path, root)
                        if (rel, i) not in allow:
                            hits.append(f"{rel}:{i}: {line.strip()}")
    assert not hits, (
        "bare .persist( in engine source — use localCheckpoint for "
        "cross-pass materialization (see docstring): " + "; ".join(hits)
    )
