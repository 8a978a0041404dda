"""Running-sum scale probe: the win_concurrency_sweep shape at N×
points per day with FIXED |days|.

Usage::

    python -m airflow_jira_etl_spark.tools.rsum_scale_probe [sf_dir] [mults]

(default sf0.1 and 1,4,10). The sweep-line's per-day prefix sum is the
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
    spark = get_spark("rsum-scale-probe")
    events = catalog.load(spark, sf_dir, "events")
    # pay Janino codegen once, outside every timed region
    for fn in (daily_max_window, daily_max_rsum):
        fn(sweep_points(events, 1)).collect()
    spark.catalog.clearCache()

    for mult in mults:
        pts = sweep_points(events, mult)
        n_pts = pts.count()
        t0 = time.time()
        got_w = {r.day_idx: (r.mx, r.c) for r in daily_max_window(pts).collect()}
        w_wall = time.time() - t0
        t0 = time.time()
        got_r = {r.day_idx: (r.mx, r.c) for r in daily_max_rsum(pts).collect()}
        r_wall = time.time() - t0
        spark.catalog.clearCache()
        assert got_w == got_r and got_r, (
            f"form divergence at mult={mult}: {len(got_w)} vs {len(got_r)} days"
        )
        print(
            f"RESULT mult={mult} points={n_pts} days={len(got_r)} "
            f"window_s={w_wall:.1f} rsum_s={r_wall:.1f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
