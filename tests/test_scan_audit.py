"""The scan-audit tool's plan classification: real FileScans vs scans
printed inside InMemoryRelation build plans (cache use sites), the
distinction the whole audit rests on — naive counting reported 8
scans for the minhash family's zero-file-read plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_jira_etl_spark.tools.scan_audit import audit_plan

SYNTHETIC = """AdaptiveSparkPlan isFinalPlan=false
+- HashAggregate(keys=[k], functions=[sum(v)])
   +- SortMergeJoin [k], [k], Inner
      :- Sort [k ASC]
      :  +- Exchange hashpartitioning(k, 32)
      :     +- InMemoryTableScan [k, v]
      :           +- InMemoryRelation [k, v], StorageLevel(memory)
      :                 +- HashAggregate(keys=[k])
      :                    +- FileScan parquet [k,v] Batched: true, Location: InMemoryFileIndex(1 paths)[file:/data/t1]
      +- Sort [k ASC]
         +- Exchange hashpartitioning(k, 32)
            +- FileScan parquet [k,v] Batched: true, Location: InMemoryFileIndex(1 paths)[file:/data/t2]
"""


def test_cached_build_scans_not_counted_as_real():
    a = audit_plan(SYNTHETIC)
    assert a["scans"] == 1  # only the t2 scan executes
    assert a["cached_scans"] == 1  # t1's scan is the printed build plan
    assert a["tables"] == 1
    assert a["imts"] == 1
    assert a["smj"] == 1
    assert a["xchg"] == 2


def test_real_plan_counts(spark, tmp_path):
    p1 = str(tmp_path / "a.parquet")
    spark.range(10).write.parquet(p1)
    df = spark.read.parquet(p1)
    # same table read twice, one side cached: one real scan for the
    # uncached side; the cached side contributes an InMemoryTableScan
    # whose printed build scan must land in cached_scans
    cached = df.groupBy().count().cache()
    cached.count()
    plan = (
        df.crossJoin(cached)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    a = audit_plan(plan)
    assert a["scans"] == 1
    assert a["cached_scans"] >= 1
    assert a["tables"] == 1
    cached.unpersist()


def test_registry_scan_contracts(spark):
    """Pin the audited scan shape of the queries whose multiplicity is
    a stated contract, so a refactor that silently re-introduces
    branch re-execution (the SCD2 five-scan class) fails here instead
    of surfacing as a 100 TB I/O bill:

    - sink_scd2_apply: exactly 2 real scans (merge pass + key probe —
      the batch is localCheckpointed; was 8 before r12);
    - llm_dedup_minhash: 0 real scans in the returned plan (signatures
      are eagerly cached; every FileScan line is a printed cache build
      plan);
    - report_funnel_steps: ≤6 scans of one table (the measured-and-
      kept lazy trade — see the query docstring), and no cartesian.
    """
    from airflow_jira_etl_spark import registry

    registry.load_all_queries()
    sf = "/root/testdata/sf0.001"

    def audited(name):
        df = registry.QUERIES[name](spark, sf)
        return audit_plan(
            df._jdf.queryExecution().executedPlan().toString()
        )

    a = audited("sink_scd2_apply")
    assert a["scans"] == 2 and a["smj"] == 0, a
    a = audited("llm_dedup_minhash")
    assert a["scans"] == 0 and a["cached_scans"] > 0, a
    a = audited("report_funnel_steps")
    assert a["scans"] <= 6 and a["tables"] == 1 and a["cart"] == 0, a
    spark.catalog.clearCache()


def test_multiplicity_flags_same_table_double_read(spark, tmp_path):
    p1 = str(tmp_path / "b.parquet")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    ).write.parquet(p1)
    df = spark.read.parquet(p1)
    two = df.unionByName(df)
    a = audit_plan(
        two._jdf.queryExecution().executedPlan().toString()
    )
    assert a["scans"] == 2 and a["tables"] == 1 and a["mult"] == 2.0
