"""release_local_checkpoint: deterministic free of localCheckpoint
blocks (DataFrame.unpersist is a no-op on them — they live in the
block manager, not the SQL cache registry — so without this helper
they linger until the ContextCleaner's periodic GC)."""

from __future__ import annotations

from pyspark import StorageLevel

from airflow_jira_etl_spark.checkpoint import release_local_checkpoint


def test_release_frees_blocks_and_later_access_fails_loudly(spark):
    df = spark.range(1000).localCheckpoint(eager=False)
    assert df.count() == 1000  # materialize the lazy checkpoint
    plan = df._jdf.queryExecution().analyzed()
    assert plan.getClass().getSimpleName() == "LogicalRDD"
    assert plan.rdd().getStorageLevel().useMemory()  # blocks resident

    assert release_local_checkpoint(df) is True
    lvl = plan.rdd().getStorageLevel()
    assert not lvl.useMemory() and not lvl.useDisk()  # blocks gone

    # the lineage is cut, so a buggy post-release access must fail
    # LOUDLY (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND) — never silently
    # recompute, which is the property the checkpoint exists for
    import pytest

    with pytest.raises(Exception, match="CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND"):
        df.count()


def test_release_is_safe_noop_on_non_checkpointed_frames(spark):
    plain = spark.range(10)
    assert release_local_checkpoint(plain) is False
    assert plain.count() == 10  # untouched

    cached = spark.range(10).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        assert cached.count() == 10
        assert release_local_checkpoint(cached) is False
        assert cached.count() == 10  # cache untouched — not our blocks
    finally:
        cached.unpersist()


def test_release_before_materialization_is_harmless(spark):
    # apply()'s finally can run after an exception raised BEFORE the
    # lazy checkpoint ever materialized — unpersist of never-persisted
    # blocks must be a quiet no-op, not a second error masking the first
    df = spark.range(100).localCheckpoint(eager=False)
    release_local_checkpoint(df)
