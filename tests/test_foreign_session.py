"""The grading driver builds its OWN SparkSession (no engine configs).
Every query must self-provision its runtime confs through the catalog
chokepoint — this suite runs a representative slice on a bare session.

NOTE: runs in the same JVM as the other tests' session (getOrCreate
shares it), so the real bare-session scenario is simulated by unsetting
the critical confs first.
"""

from __future__ import annotations

import pytest

from airflow_jira_etl_spark import registry, session

registry.load_all_queries()

REPRESENTATIVE = [
    "scan_parquet",
    "fn_time_of_day",          # events: nanos timestamp read
    "stream_tumbling_count",   # events: streaming read
    "flagship_revenue_by_nation",
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_query_self_provisions_confs(name, spark, sf_dir):
    # simulate a foreign session: wrong TZ + nanos flag off + memo cleared
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    session._CONFED_SESSIONS.clear()
    try:
        df = registry.QUERIES[name](spark, sf_dir)
        assert df.count() > 0
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        session._CONFED_SESSIONS.clear()
        for k, v in session.RUNTIME_CONFS.items():
            spark.conf.set(k, v)
