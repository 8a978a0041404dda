"""Streaming scale probe: replicate the events table N× (more users,
same time horizon) and measure the stateful streaming queries at each
multiple.

Usage::

    python -m airflow_jira_etl_spark.tools.stream_scale_probe [sf_dir] [mults]

(default sf0.1 and 1,4,10). Completes the probe trio: the dedup probe
demonstrates SUB-linear candidate growth, the TPC-H probe demonstrates
no-blow-up on shuffle-heavy relational plans, and this one
demonstrates that the stateful streaming operators' wall grows at most
linearly in event volume when the extra volume is extra KEYS — each
replica offsets event_id AND user_id, so 10× means 10× concurrent
users over the SAME time window, the realistic scale path. State per
key (dedup set, session accumulator, profile struct) is constant;
total state ∝ keys; watermarks bound it in time. Super-linear wall
here would mean state lookups or the availableNow harness degrade with
state size.

Each multiple reports two walls per query: cold (first run, includes
the one-time event-page staging for the scaled fixture — honest ingest
cost, itself ∝ data) and steady (second run, pages cached), so harness
fixed cost and per-event cost are separable.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.session import get_spark

PROBES = (
    "stream_dedup_keys",  # keyed dropDuplicates state
    "stream_tumbling_count",  # windowed aggregate state
    "stream_session_window",  # session-gap state per user
    "stream_stateful_profile",  # applyInPandasWithState per user
)


def build_scaled(sf_dir: str, mult: int, out_dir: str) -> None:
    """Materialize a mult× fixture dir: events replicated with
    event_id/user_id offsets (same timestamps — more concurrent users),
    every other table symlinked. Replication happens arrow-side into a
    SINGLE parquet file, matching the fixture layout: the streaming
    file source lists the staged directory non-recursively, so a
    Spark-written events.parquet DIRECTORY would be silently invisible
    to every probe query (measured: 0 output rows)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(catalog.table_path(sf_dir, "events"))
    e_stride = int(pc.max(t.column("event_id")).as_py()) + 1
    u_stride = int(pc.max(t.column("user_id")).as_py()) + 1
    parts = []
    for r in range(mult):
        p = t.set_column(
            t.schema.get_field_index("event_id"),
            "event_id",
            pc.add(t.column("event_id"), r * e_stride),
        )
        p = p.set_column(
            p.schema.get_field_index("user_id"),
            "user_id",
            pc.add(p.column("user_id"), r * u_stride),
        )
        parts.append(p)
    pq.write_table(
        pa.concat_tables(parts),
        os.path.join(out_dir, "events.parquet"),
        store_schema=False,
    )
    for tname in catalog.TABLES:
        dst = os.path.join(out_dir, f"{tname}.parquet")
        if not os.path.exists(dst):
            os.symlink(catalog.table_path(sf_dir, tname), dst)


def main(argv: list[str]) -> int:
    from airflow_jira_etl_spark import registry

    registry.load_all_queries()
    # absolute path: symlink targets must not dangle from the temp dir
    sf_dir = os.path.abspath(argv[1] if len(argv) > 1 else "/root/testdata/sf0.1")
    mults = [
        int(m) for m in (argv[2].split(",") if len(argv) > 2 else ["1", "4", "10"])
    ]

    spark = get_spark("stream-scale-probe")
    for name in PROBES:  # Janino + streaming-harness warmup, untimed
        registry.QUERIES[name](spark, sf_dir).collect()

    root = tempfile.mkdtemp(prefix="stream_scale_")
    staged: list[str] = []
    try:
        for mult in mults:
            out_dir = os.path.join(root, f"x{mult}")
            os.makedirs(out_dir)
            # the streaming queries stage event pages under the SHARED
            # page cache keyed by this out_dir's (unique, per-run)
            # path hash — no later run can ever cache-hit them and no
            # reaper matches shared caches, so without explicit
            # cleanup every probe invocation strands a full scaled
            # copy of the events table in .scratch
            from airflow_jira_etl_spark.queries.streaming_queries import (
                SCRATCH as _STREAM_SCRATCH,
            )
            from airflow_jira_etl_spark.streaming.source import pages_dir_for

            staged.append(pages_dir_for(_STREAM_SCRATCH, out_dir))
            build_scaled(sf_dir, mult, out_dir)
            n_ev = catalog.load(spark, out_dir, "events").count()
            cells = []
            for name in PROBES:
                t0 = time.time()
                rows = registry.QUERIES[name](spark, out_dir).count()
                cold = time.time() - t0
                t0 = time.time()
                registry.QUERIES[name](spark, out_dir).count()
                steady = time.time() - t0
                cells.append(f"{name}_cold={cold:.1f} {name}_s={steady:.1f} {name}_rows={rows}")
            spark.catalog.clearCache()
            print(f"RESULT mult={mult} events={n_ev} " + " ".join(cells), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        for d in staged:
            shutil.rmtree(d, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
