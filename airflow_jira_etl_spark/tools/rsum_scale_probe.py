"""Running-sum scale probe: the win_concurrency_sweep shape at N×
points per day with FIXED |days|, plus the orthogonal growing-|days|
axis at FIXED total points.

Usage::

    python -m airflow_jira_etl_spark.tools.rsum_scale_probe \
        [sf_dir] [mults] [days_mults]

(default sf0.1, point mults 1,4,10, days axis off). The sweep-line's
per-day prefix sum is the
last fact-scale LOW-cardinality window partition in the engine
(PLANS.md "Known single-task spots"): ``Window.partitionBy(day_idx)``
caps parallelism at |days|, so growing the per-day point count grows
per-TASK work linearly with no way to spread it. This probe replicates
the events table N× at IDENTICAL timestamps — |days| stays fixed, each
day's endpoint set grows N× — and measures both forms:

- ``window``: the registered query's ``sum() OVER (PARTITION BY
  day_idx ...)`` (pinned this round, swapped in round 10),
- ``rsum``: the same pipeline over
  ``operators/ranking.grouped_running_sum`` (range shuffle + subtotal
  offsets + (day, pid)-partitioned local sums — every stage spreads
  across the full cluster width).

Both forms must produce the identical per-day (max, count) — asserted
per multiple, so the probe is also an at-scale equivalence check.
Evidence target: rsum wall growth ≈linear-in-points at 10×, bounded by
shuffle width rather than by |days| tasks.

The |days| axis (``days_mults``, e.g. ``1,10,100``) measures the
operator's APPLICABILITY CONDITION: grouped_running_sum's bookkeeping
pass collects one row per (partition, group) — ``n_parts × |days|``
rows on the driver — and broadcasts the per-group offsets back. The
fixture spans 30 days; each replica shifts its timestamps by a whole
number of 32-day blocks, so days_mult D yields ~30·D distinct day_idx
groups at a FIXED total point count (point mult pinned to 4). Evidence
target: rsum wall ≈flat in |days| while the collect stays
n_parts × |days| rows (printed as meta_rows) — i.e. the bookkeeping
never approaches fact scale at 100× group cardinality.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.operators.ranking import grouped_running_sum
from airflow_jira_etl_spark.queries.windows import concurrency_points
from airflow_jira_etl_spark.session import get_spark


def sweep_points(events: DataFrame, mult: int) -> DataFrame:
    """The registered query's point-set construction (the SHARED
    windows.concurrency_points builder — this probe must measure the
    real shape, not a copy that can drift), over events replicated
    mult× at identical timestamps — same |days|, mult× endpoints per
    day."""
    rep = events.crossJoin(
        events.sparkSession.range(mult).select(F.col("id").alias("_rep"))
    )
    return concurrency_points(rep)


def sweep_points_days(events: DataFrame, mult: int, days_mult: int) -> DataFrame:
    """The |days| axis: mult× replicas as in sweep_points, but every
    row shifts its timestamp by a HASH-assigned whole 32-day block in
    [0, days_mult) — the fixture's 30-day span lands in disjoint day
    ranges per block, so |days| grows ~days_mult× while the total point
    count stays at mult× (point growth and group-cardinality growth
    decouple; hash assignment keeps block population uniform regardless
    of mult)."""
    block_us = 32 * 86_400_000_000
    rep = events.crossJoin(
        events.sparkSession.range(mult).select(F.col("id").alias("_rep"))
    ).select(
        F.timestamp_micros(
            F.unix_micros(F.col("ts"))
            + F.pmod(F.hash("event_id", "_rep"), F.lit(days_mult))
            * F.lit(block_us)
        ).alias("ts")
    )
    return concurrency_points(rep)


def daily_max_window(pts: DataFrame) -> DataFrame:
    w = (
        Window.partitionBy("day_idx")
        .orderBy("pt_us", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pts.select("day_idx", F.sum("delta").over(w).alias("live"))
        .groupBy("day_idx")
        .agg(F.max("live").alias("mx"), F.count(F.lit(1)).alias("c"))
    )


def daily_max_rsum(pts: DataFrame) -> DataFrame:
    run = grouped_running_sum(
        pts,
        ["day_idx"],
        [F.col("pt_us"), F.col("delta")],
        F.col("delta"),
        sum_col="live",
    )
    return run.groupBy("day_idx").agg(
        F.max("live").alias("mx"), F.count(F.lit(1)).alias("c")
    )


def main(argv: list[str]) -> int:
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    mults = [
        int(m) for m in (argv[2].split(",") if len(argv) > 2 else ["1", "4", "10"])
    ]
    days_mults = [
        int(d) for d in (argv[3].split(",") if len(argv) > 3 else [])
    ]
    spark = get_spark("rsum-scale-probe")
    events = catalog.load(spark, sf_dir, "events")
    # pay Janino codegen once, outside every timed region
    for fn in (daily_max_window, daily_max_rsum):
        fn(sweep_points(events, 1)).collect()
    spark.catalog.clearCache()

    def measure(pts: DataFrame, label: str) -> None:
        n_pts = pts.count()
        t0 = time.time()
        got_w = {r.day_idx: (r.mx, r.c) for r in daily_max_window(pts).collect()}
        w_wall = time.time() - t0
        t0 = time.time()
        got_r = {r.day_idx: (r.mx, r.c) for r in daily_max_rsum(pts).collect()}
        r_wall = time.time() - t0
        spark.catalog.clearCache()
        # explicit check, not a bare assert: under `python -O` asserts
        # are stripped and the probe would silently stop being an
        # equivalence gate; on divergence name the first differing day
        # and its values, not just the day counts
        if not got_r or got_w != got_r:
            diff = sorted(
                k
                for k in set(got_w) | set(got_r)
                if got_w.get(k) != got_r.get(k)
            )[:3]
            detail = ", ".join(
                f"day {k}: window={got_w.get(k)} rsum={got_r.get(k)}"
                for k in diff
            )
            raise RuntimeError(
                f"form divergence at {label} ({len(got_w)} vs "
                f"{len(got_r)} days): {detail or 'both empty'}"
            )
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        print(
            f"RESULT {label} points={n_pts} days={len(got_r)} "
            f"meta_rows<={n_parts * len(got_r)} "
            f"window_s={w_wall:.1f} rsum_s={r_wall:.1f}",
            flush=True,
        )

    for mult in mults:
        measure(sweep_points(events, mult), f"mult={mult}")
    for dm in days_mults:
        # point mult pinned to 4: enough rows that per-day work is
        # non-trivial, constant across the days sweep
        measure(sweep_points_days(events, 4, dm), f"days_mult={dm}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
