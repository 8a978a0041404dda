"""Whole-registry physical-plan lint: scale anti-patterns must not
appear in ANY registered query's executed plan, not just the few with
hand-written plan guards.

Two anti-patterns are linted:

- ``CartesianProduct`` — an unbroadcast cross join shuffles |A|x|B|
  at cluster scale; every deliberate no-equi-key join in the engine is
  a BroadcastNestedLoopJoin instead.
- ``BatchEvalPython`` (row-at-a-time Python UDF) — only the explicit
  API-parity surface (udf_python_scalar, udtf_explode_kv's UDTF) may
  pay the per-row Python round-trip; everything else must stay JVM or
  Arrow-batched.

Sink/stream/source queries are excluded: building their DataFrame runs
real side effects (streams, table writes), and the returned batch
DataFrame's plan is a trivial read of the result, not the interesting
pipeline (their plan shapes are asserted by dedicated tests).
"""

from __future__ import annotations

import pytest

from airflow_jira_etl_spark import registry

registry.load_all_queries()

_EXCLUDED_PREFIXES = ("stream_", "sink_", "source_", "mv_", "cdc_")
_ROW_UDF_ALLOWED = {"udf_python_scalar", "udtf_explode_kv"}

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
