"""TPC-H-family scale probe: replicate the fact tables N× (disjoint
order keys, same dimension tables) and measure the shuffle-heavy
registered queries at each multiple.

Usage::

    python -m airflow_jira_etl_spark.tools.tpch_scale_probe [sf_dir] [mults]

(default sf0.1 and 1,4,10). The dedup probe (scale_probe.py) checks
SUB-linear growth — candidate pruning is the point there. Here the
point is the absence of blow-up: joins, windows and aggregations whose
shuffle traffic is ∝ input rows must show ≈linear wall growth at 10×
data with FIXED group/dimension cardinality (revenue per nation still
outputs 25 rows at any scale; Q21's per-order window state stays
bounded by suppliers-per-order). Super-linear wall growth here means a
plan degraded (lost broadcast, spilled, re-shuffled) — exactly what
would hurt first on a 1000-executor 100 TB run.

Scaled fixtures are materialized as parquet (replica r offsets every
l_orderkey/o_orderkey by r·stride; dimensions symlinked), so the
registered queries run UNCHANGED through catalog.load — the probe
measures the real query plans, not a variant.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.session import get_spark
from airflow_jira_etl_spark.tools.replication import (
    key_stride,
    replicate_with_stride,
)

PROBES = (
    "flagship_revenue_by_nation",  # star join + fixed-domain agg
    "report_waiting_suppliers",  # fact window over join partitioning
    "agg_group_sum",  # wide hash aggregate
    "win_topk_per_group",  # windowed top-k per customer
    "sort_multi_key",  # distributed global rank (operators/ranking.py)
    "agg_exact_quantiles",  # grouped rank-select, 3 groups (skew case)
)


def build_scaled(spark, sf_dir: str, mult: int, out_dir: str) -> None:
    """Materialize a mult× fixture dir: fact tables replicated with
    order keys offset per replica, everything else symlinked. ONE
    stride (from orders, the key's home table) is shared by both fact
    tables so replica lineitems still reference their replica's
    orders."""
    orders = catalog.load(spark, sf_dir, "orders")
    li = catalog.load(spark, sf_dir, "lineitem")
    stride = key_stride(orders, "o_orderkey")

    replicate_with_stride(orders, "o_orderkey", mult, stride).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "orders.parquet"))
    replicate_with_stride(li, "l_orderkey", mult, stride).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "lineitem.parquet"))
    for t in catalog.TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(catalog.table_path(sf_dir, t), dst)


def main(argv: list[str]) -> int:
    from airflow_jira_etl_spark import registry

    registry.load_all_queries()
    # absolute path: the dimension symlinks below are created inside a
    # temp dir, so a relative sf_dir would make them dangle
    sf_dir = os.path.abspath(argv[1] if len(argv) > 1 else "/root/testdata/sf0.1")
    mults = [
        int(m) for m in (argv[2].split(",") if len(argv) > 2 else ["1", "4", "10"])
    ]

    spark = get_spark("tpch-scale-probe")
    # pay Janino codegen once, outside every timed region
    for name in PROBES:
        registry.QUERIES[name](spark, sf_dir).collect()

    root = tempfile.mkdtemp(prefix="tpch_scale_")
    try:
        for mult in mults:
            out_dir = os.path.join(root, f"x{mult}")
            os.makedirs(out_dir)
            build_scaled(spark, sf_dir, mult, out_dir)
            n_li = catalog.load(spark, out_dir, "lineitem").count()
            walls = {}
            for name in PROBES:
                t0 = time.time()
                rows = registry.QUERIES[name](spark, out_dir).count()
                walls[name] = (time.time() - t0, rows)
            spark.catalog.clearCache()
            print(
                f"RESULT mult={mult} lineitem={n_li} "
                + " ".join(
                    f"{n}_s={w:.1f} {n}_rows={r}" for n, (w, r) in walls.items()
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
