"""Structured Streaming source over the events fixture.

The reference's only streaming notion is micro-batches of ≤100 rows
from paginated REST responses (``worklog_processor.py:80-106``,
``limit=100`` at ``fetch_jira_tempo_worklogs.py:31``). Here the same
shape is a file-source stream consumed with the ``availableNow``
trigger: bounded input, processed as micro-batches, exactly the
batch-equivalent semantics the DuckDB oracle can check.

For multi-batch pipelines (the foreachBatch upsert), the events table
is first split into page files (the reference's pages) and streamed
with ``maxFilesPerTrigger=1`` so each page arrives as its own
micro-batch — a faithful, testable stand-in for the cursor loop.
"""

from __future__ import annotations

import contextlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_jira_etl_spark.catalog import (
    SCHEMAS,
    conform,
    file_schema,
    table_path,
)
from airflow_jira_etl_spark.scratch import SCRATCH as _SCRATCH


def _sf_tag(sf_dir: str) -> str:
    """Identity tag for per-source scratch dirs (catalog.source_tag:
    basename + abspath hash). Basename alone is not an identity — two
    fixtures at /a/sf0.01 and /b/sf0.01 would share one staged-stream
    dir and one page cache, and since their wanted-link-sets/meta
    idents differ, every query would rebuild the shared dir under the
    OTHER session's running stream (the flock serializes builders
    against each other, not against a reader that already started)."""
    from airflow_jira_etl_spark.catalog import source_tag

    return source_tag(sf_dir)


def _staged_events_dir(sf_dir: str) -> str:
    """The file stream source requires a DIRECTORY of data files; stage
    the events parquet into one via symlinks (no copy).

    The source LISTS the staged directory non-recursively, so a
    directory-shaped events.parquet (Spark-style part-file output — a
    layout a future fixture regeneration could ship) must be staged as
    one link per data file; linking the directory itself makes the
    stream silently read ZERO rows (measured while building the
    streaming scale probe). Both layouts re-stage whenever the expected
    link set changes."""
    d = os.path.join(_SCRATCH, "stream_src", _sf_tag(sf_dir))
    os.makedirs(d, exist_ok=True)
    # absolute targets: a RELATIVE sf_dir would store the relative
    # string in the link, which the kernel resolves against the link's
    # own directory (.scratch/stream_src/<tag>/), not the cwd —
    # dangling links that the _current()==wanted check would then
    # consider "correctly staged" forever
    src = os.path.abspath(table_path(sf_dir, "events"))
    if os.path.isdir(src):
        wanted = {
            f"events_{f}": os.path.join(src, f)
            for f in sorted(os.listdir(src))
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        }
    else:
        wanted = {"events.parquet": src}
    def _current() -> dict:
        return {
            e: os.readlink(os.path.join(d, e))
            for e in os.listdir(d)
            if os.path.islink(os.path.join(d, e))
        }

    if _current() != wanted:
        # same cross-process hazard class as write_event_pages: two
        # fresh sessions racing the stage loop collide on os.symlink
        # (FileExistsError), and a re-stage unlinks the whole set under
        # another session's running stream — serialize with a flock and
        # re-check inside it
        import fcntl

        with open(d + ".lock", "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            if _current() != wanted:
                for e in os.listdir(d):
                    p = os.path.join(d, e)
                    if os.path.islink(p):
                        os.remove(p)
                for name, target in wanted.items():
                    os.symlink(target, os.path.join(d, name))
    return d


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events table. A streaming source needs its
    schema up front, so the file's physical schema is sniffed with the
    batch footer reader (catalog.file_schema) and conformed to the
    declared contract — same per-file drift handling as catalog.load
    (the fixture has shipped e.g. both TIMESTAMP(NANOS) and MICROS
    across generations)."""
    from airflow_jira_etl_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    staged = _staged_events_dir(sf_dir)
    # file_schema keys its cache on per-part stats for dir-shaped
    # sources (an in-place part rewrite leaves the dir stat unchanged),
    # so the sniff stays fresh across fixture regenerations here too
    actual = file_schema(spark, table_path(sf_dir, "events"))
    raw = spark.readStream.schema(actual).parquet(staged)
    return conform(raw, SCHEMAS["events"])


def pages_dir_for(scratch: str, sf_dir: str) -> str:
    """Per-source page directory. The page cache is keyed by source
    mtime/size in its meta file, but two SESSIONS on different sources
    sharing one directory would rewrite it back and forth under each
    other's running streams — the dir name itself must carry the
    source identity (_sf_tag: basename + abspath hash, so same-named
    fixtures at different paths get distinct caches)."""
    return os.path.join(scratch, f"event_pages_{_sf_tag(sf_dir)}")


def _src_fingerprint(src: str) -> list:
    """Content identity of the events source as (name, mtime_ns, size)
    entries — one for a plain file, one PER PART FILE for a
    directory-shaped parquet (whose own mtime does not reflect in-place
    part rewrites)."""
    if not os.path.isdir(src):
        st = os.stat(src)
        return [["", st.st_mtime_ns, st.st_size]]
    out = []
    for f in sorted(os.listdir(src)):
        if f.startswith((".", "_")):
            continue
        st = os.stat(os.path.join(src, f))
        out.append([f, st.st_mtime_ns, st.st_size])
    return out


def write_event_pages(
    spark: SparkSession, sf_dir: str, out_dir: str, n_pages: int = 8
) -> int:
    """Materialize the events table as ordered page files (the
    reference's paginated responses). Page COUNT is fixed and page
    size scales with the table — each downstream micro-batch MERGE
    rewrites the table once, so total work is O(n_pages · n), not the
    O(n²/page_size) a fixed-size page would cost. Returns the page
    size (rows per page). Rows with a NULL event_id are dropped — they
    have no position in the id-derived layout (the r15 NULL entity-key
    convention; every consumer's oracle filters event_id IS NOT NULL
    to match — see the in-body comment).

    The page layout is deterministic in (source, n_pages), so an
    existing directory with a matching meta file is reused as-is —
    repeated streaming queries in one sweep pay the paging cost once.

    Builders are serialized across PROCESSES with an exclusive flock:
    two concurrent sessions (e.g. a test run alongside a bench run)
    otherwise race the check-rebuild sequence — one rmtree's the pages
    the other's running stream is reading mid-query. The loser of the
    lock re-validates the meta and returns without rebuilding.

    A cache HIT costs only os.stat calls — no Spark job: the meta's
    identity fields (source fingerprint, n_pages, layout) are checked
    first and the recorded total derives the page size, so the
    max(event_id) scan runs only when a rebuild is actually needed."""
    import json

    src = table_path(sf_dir, "events")
    ident = {
        # the fingerprint covers DIRECTORY-shaped sources too (one entry
        # per part file): a dir's own mtime does not change when a part
        # file is overwritten in place, so stat'ing just the dir would
        # serve stale pages after a fixture regeneration
        "src": src,
        "src_fp": _src_fingerprint(src),
        "n_pages": n_pages,
        # page-format version — bump when the written page schema
        # changes (v2: ts persisted as a real timestamp, not raw long;
        # v3: NULL-event_id rows dropped from the paged stream)
        "layout": 3,
    }
    meta_path = os.path.join(out_dir, "_PAGES_META.json")

    def _current_total() -> int | None:
        try:
            with open(meta_path) as f:
                m = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None
        return m["total"] if {k: m.get(k) for k in ident} == ident else None

    total = _current_total()
    if total is not None:  # fast path: zero Spark jobs, no lock traffic
        return -(-total // n_pages)

    from airflow_jira_etl_spark import catalog

    # NULL-key convention (r15, the entity-key analog of the docs
    # corpus's NULL doc_id rule): a row with a NULL event_id has no
    # position in the id-derived page layout — it cannot be paged,
    # cursor-addressed, or upsert-addressed (the reference's unique-key
    # contract, db_ops.py:29-43: a NULL unique_column row is
    # unaddressable by MERGE). Such rows are DROPPED from the paged
    # stream, on both engines: every oracle downstream of this source
    # filters event_id IS NOT NULL to match. max/min skip NULLs, so the
    # stats row already describes the kept rows.
    events = catalog.load(spark, sf_dir, "events").where(
        F.col("event_id").isNotNull()
    )
    stats = events.agg(F.max("event_id"), F.min("event_id")).collect()[0]
    max_id, min_id = stats[0], stats[1]
    if max_id is None:
        raise ValueError(
            f"events table at {src} is empty — cannot page a zero-row "
            f"stream source"
        )
    if min_id < 0:
        # page ids derive from event_id: a negative id lands below page
        # 0, outside the rename loop's range(n_pages), where the _tmp
        # cleanup would DELETE the rows silently while the meta file
        # commits the build as complete
        raise ValueError(
            f"events.event_id must be non-negative to page "
            f"deterministically (min={min_id})"
        )
    total = int(max_id) + 1
    page_size = -(-total // n_pages)  # ceil
    meta = {**ident, "total": total}
    import fcntl

    os.makedirs(os.path.dirname(out_dir) or ".", exist_ok=True)
    with open(out_dir + ".lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        if _current_total() == total:  # built while we waited
            return page_size
        return _build_event_pages(
            events, out_dir, meta, meta_path, n_pages, page_size
        )


def _build_event_pages(
    events: DataFrame,
    out_dir: str,
    meta: dict,
    meta_path: str,
    n_pages: int,
    page_size: int,
) -> int:
    """The rebuild body of write_event_pages — caller holds the flock."""
    import json

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    # ONE job writes every page (hash-partition on the page id -> each
    # page's rows land in exactly one task -> one file per page dir),
    # instead of n_pages sequential full-table filter+write jobs
    tmp = os.path.join(out_dir, "_tmp")
    (
        events.withColumn(
            # `div`, NOT `/`: the latter is DOUBLE division, which
            # rounds for event_id beyond 2^53 (the same hazard
            # range_bucketer documents) — and a rounded-UP id at the
            # top page boundary would land at pg == n_pages, outside
            # the rename loop, where the _tmp cleanup deletes the rows
            # silently. Integer div over the validated 0..max range is
            # exact by construction.
            "pg",
            F.format_string("%05d", F.expr(f"event_id div {page_size}")),
        )
        .repartition(n_pages, "pg")
        .write.partitionBy("pg")
        .parquet(tmp)
    )
    # rename pg=NNNNN -> page_NNNNN (drops partition-discovery syntax)
    # and stamp strictly increasing mtimes: the file stream source
    # orders files by modification time, so this pins micro-batch
    # order to cursor order deterministically
    now = int(os.path.getmtime(tmp))
    for i in range(n_pages):
        src_dir = os.path.join(tmp, f"pg={i:05d}")
        dst_dir = os.path.join(out_dir, f"page_{i:05d}")
        if not os.path.isdir(src_dir):
            continue  # empty page (no rows in range)
        os.rename(src_dir, dst_dir)
        for fn in os.listdir(dst_dir):
            os.utime(os.path.join(dst_dir, fn), (now + i, now + i))
    shutil.rmtree(tmp, ignore_errors=True)
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return page_size


STREAM_STATE_PARTITIONS = "4"


def py_stateful_state_partitions(spark) -> str:
    """Shard count for PYTHON-stateful streaming stages
    (applyInPandasWithState), r15: the per-group update function runs
    in Python workers, so the stage is compute-bound in Python and its
    wall scales with how many workers run in parallel — unlike the
    JVM stateful operators, where per-shard state-commit fixed cost
    dominates and the small STREAM_STATE_PARTITIONS default wins
    (measured: the JVM floor gets WORSE at 8 shards, while the
    pystate profile improves 4.12 s -> 3.67 s at 8). Scales with the
    session's actual core count (defaultParallelism tracks
    local[$SPARK_GRAFT_CPUS] here and executor slots on a cluster),
    never below the state default — the driver's low-core bench runs
    keep the old shard count. The // 4 divisor means the count only
    rises above the default of 4 past 16 cores (ADVICE r15): that is
    deliberate — the measured win is at 32 cores, 16 shards measured
    flat-to-worse there, and 8-16-core sessions keeping the default is
    exactly the behavior the low-core bench validated; a gentler
    divisor would need its own measurements at those widths first."""
    return str(
        max(
            int(STREAM_STATE_PARTITIONS),
            spark.sparkContext.defaultParallelism // 4,
        )
    )



ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@contextlib.contextmanager
def scoped_shuffle_partitions(spark, n: str = STREAM_STATE_PARTITIONS):
    """Stateful streaming shard count = shuffle partitions at query
    start, and every shard costs a state directory + task per
    micro-batch. Scope it to the state size (keys/windows — hundreds
    to thousands here), not CPU count. Delegates to the generic helper
    in session.py.

    Also the engine's state-store selection point (every streaming
    start site passes through here): ``SPARK_GRAFT_STATE_STORE=rocksdb``
    swaps the default heap-backed provider — which keeps each shard's
    ENTIRE state in executor memory — for RocksDB, which spills state
    to executor-local disk. The default is right for the test fixtures;
    RocksDB is the 100 TB path, where per-shard keyed state (billions of
    keys × windows) cannot live on-heap. Both providers are exercised
    against the same oracles (tests/test_streaming.py)."""
    from airflow_jira_etl_spark.session import (
        scoped_shuffle_partitions as generic,
    )

    want = os.environ.get("SPARK_GRAFT_STATE_STORE", "").lower()
    with generic(spark, n):
        if want != "rocksdb":
            yield
            return
        try:
            old = spark.conf.get(_PROVIDER_KEY)
        except Exception:
            old = None
        spark.conf.set(_PROVIDER_KEY, ROCKSDB_PROVIDER)
        try:
            yield
        finally:
            if old:
                spark.conf.set(_PROVIDER_KEY, old)
            else:
                spark.conf.unset(_PROVIDER_KEY)


def run_to_completion(
    spark, checkpoint: str, start, state_partitions: str | None = None
) -> None:
    """The ONE availableNow run lifecycle — fresh throwaway checkpoint,
    state partitions scoped for the run, blocking await, checkpoint
    removed on every exit path (crashed runs leave theirs for the
    caller's dead-session reaper). ``start`` receives the checkpoint
    path and must return the started StreamingQuery; the memory-sink
    harness below and custom sinks (foreachBatch upsert) share this so
    a lifecycle fix can never apply to one start site and miss the
    other."""
    shutil.rmtree(checkpoint, ignore_errors=True)
    try:
        with scoped_shuffle_partitions(
            spark, state_partitions or STREAM_STATE_PARTITIONS
        ):
            start(checkpoint).awaitTermination()
    finally:
        shutil.rmtree(checkpoint, ignore_errors=True)


def run_available_now(
    stream_df: DataFrame,
    checkpoint: str,
    name: str,
    output_mode: str = "complete",
    state_partitions: str | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to completion with availableNow into a
    memory sink; return the result as a batch DataFrame.
    ``state_partitions`` overrides the engine's state-shard default for
    Python-compute-bound stateful stages (see
    py_stateful_state_partitions)."""
    spark = stream_df.sparkSession

    def start(ck: str):
        return (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )

    run_to_completion(spark, checkpoint, start, state_partitions)
    return spark.sql(f"SELECT * FROM {name}")
