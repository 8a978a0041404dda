"""Scale probe for the DISTRIBUTED connected-components path.

``operators/components.connected_components`` switches from driver
union-find to label propagation + pointer jumping above
SMALL_EDGE_LIMIT edges; the registered clusters queries exercise that
path only at large corpora, so this probe measures it directly:

- wall vs edge count on a verifiable topology (many short chains for
  volume + one 1000-vertex chain for diameter — pointer jumping must
  close diameter 999 in ~10 rounds, forcing multiple checkpoint
  generations and therefore the round-11 deterministic release of
  superseded generations);
- exact correctness at every multiple (every vertex's component is
  its chain's head id — checked distributed, not collected);
- resident block-manager storage AFTER each run, which with the
  release in place must stay ~one generation, not one per checkpoint
  round.

Usage::

    python -m airflow_jira_etl_spark.tools.components_scale_probe [mults]
    python -m airflow_jira_etl_spark.tools.components_scale_probe boundary [counts]

(default mults ``1,5,20`` → ~88k/440k/1.76M directed input edges).

``boundary`` mode probes the driver/distributed CUTOVER itself
(SMALL_EDGE_LIMIT = 200k): at each edge count (default
``150000,200000,250000``) it runs BOTH paths on the same graph with
realistic full-width 64-bit ids, checks they agree, and reports each
path's wall plus the driver-heap peak the union-find's collect
actually allocates — the two numbers the threshold's placement rests
on (the driver form must win on wall below the limit, and a
limit-sized collect must stay far under driver heap).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from airflow_jira_etl_spark.session import get_spark

CHAIN_LEN = 5
BASE_CHAINS = 20_000
DEEP_BASE = 1_000_000_000  # id space far above the short chains
DEEP_LEN = 1_000


def build_pairs(spark, mult: int):
    """(id1, id2) edges: BASE_CHAINS*mult aligned 5-chains plus one
    1000-vertex chain at DEEP_BASE. Component truth: id - id%5 for the
    short chains, DEEP_BASE for the deep one."""
    n = BASE_CHAINS * mult * CHAIN_LEN
    short = (
        spark.range(n)
        .where(F.col("id") % CHAIN_LEN != CHAIN_LEN - 1)
        .select(F.col("id").alias("id1"), (F.col("id") + 1).alias("id2"))
    )
    deep = (
        spark.range(DEEP_BASE, DEEP_BASE + DEEP_LEN - 1)
        .select(F.col("id").alias("id1"), (F.col("id") + 1).alias("id2"))
    )
    return short.union(deep)


def expected_component(col):
    return F.when(col >= DEEP_BASE, F.lit(DEEP_BASE)).otherwise(
        col - col % CHAIN_LEN
    )


def resident_storage(spark) -> tuple[int, int]:
    """(n resident RDDs, total bytes) from the block manager — shows
    whether superseded checkpoint generations were actually released."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return len(infos), sum(
        i.memSize() + i.diskSize() for i in infos
    )


def boundary(argv: list[str]) -> int:
    """Probe the SMALL_EDGE_LIMIT cutover: run the driver union-find
    AND the distributed loop on the same graph at each edge count,
    check agreement, report walls + the driver-heap peak the local
    path's collect allocates (tracemalloc: edge Rows + parent dict +
    result rows — the allocation the 200k limit bounds)."""
    import tracemalloc

    import airflow_jira_etl_spark.operators.components as C
    from airflow_jira_etl_spark.checkpoint import release_local_checkpoint

    counts = [
        int(c)
        for c in (
            argv[2].split(",") if len(argv) > 2 else ["150000", "200000", "250000"]
        )
    ]
    spark = get_spark("components-boundary-probe")
    orig_limit = C.SMALL_EDGE_LIMIT
    # realistic id widths: full 64-bit ids (document fingerprints /
    # hash ids), not small test ints — Python int + Row overhead per
    # collected edge is what the driver actually holds
    offset = 4_611_686_018_427_000_000  # ~2^62
    for n_edges in counts:
        # aligned 5-chains → 4 edges per chain; truth: chain head id
        chains = n_edges // (CHAIN_LEN - 1)
        pairs = (
            spark.range(chains * CHAIN_LEN)
            .where(F.col("id") % CHAIN_LEN != CHAIN_LEN - 1)
            .select(
                (F.col("id") + offset).alias("id1"),
                (F.col("id") + offset + 1).alias("id2"),
            )
        )
        actual = pairs.count()  # untimed

        def run(path_limit):
            C.SMALL_EDGE_LIMIT = path_limit
            t0 = time.perf_counter()
            labels = C.connected_components(pairs, max_iters=20)
            n_bad = labels.where(
                (F.col("component") - offset)
                != (F.col("id") - offset)
                - (F.col("id") - offset) % CHAIN_LEN
            ).count()
            wall = time.perf_counter() - t0
            spark.catalog.clearCache()
            labels.unpersist()
            release_local_checkpoint(labels)
            return wall, n_bad

        try:
            tracemalloc.start()
            local_wall, local_bad = run(10**15)  # force driver path
            heap_peak = tracemalloc.get_traced_memory()[1]
            tracemalloc.stop()
            dist_wall, dist_bad = run(0)  # force distributed path
        finally:
            C.SMALL_EDGE_LIMIT = orig_limit
        print(
            f"BOUNDARY edges={actual} local_s={local_wall:.1f} "
            f"dist_s={dist_wall:.1f} local_heap_peak_mb="
            f"{heap_peak / 1e6:.0f} bad={local_bad + dist_bad}",
            flush=True,
        )
        if local_bad or dist_bad:
            return 1
    return 0


def main(argv: list[str]) -> int:
    import airflow_jira_etl_spark.operators.components as C

    from airflow_jira_etl_spark.checkpoint import release_local_checkpoint

    if len(argv) > 1 and argv[1] == "boundary":
        return boundary(argv)
    mults = [int(m) for m in (argv[1].split(",") if len(argv) > 1 else ["1", "5", "20"])]
    spark = get_spark("components-scale-probe")
    # measure through the PUBLIC wrapper (forced onto the distributed
    # path) so the loop runs under the same edge-count-scaled
    # scoped_shuffle_partitions the registered clusters queries use —
    # calling C._connected_components directly ran the fixpoint at the
    # session default width, a different configuration than the one
    # the probe's PLANS numbers claim to describe
    C.SMALL_EDGE_LIMIT = 0
    for mult in mults:
        pairs = build_pairs(spark, mult)
        n_edges = pairs.count()  # outside the timed window
        t0 = time.perf_counter()
        labels = C.connected_components(pairs, max_iters=20)
        bad = labels.where(
            F.col("component") != expected_component(F.col("id"))
        ).count()
        n_vertices = labels.count()
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        # release the returned (newest) label generation — the
        # operator deliberately leaves it alive for the caller, and
        # clearCache() does NOT drop localCheckpoint RDD blocks, so
        # without this the NEXT multiple's resident_after reading
        # includes the previous run's generation and the probe's
        # "storage stays ~one generation" claim reads as a leak that
        # is actually measurement contamination
        labels.unpersist()
        release_local_checkpoint(labels)
        n_rdds, res_bytes = resident_storage(spark)
        print(
            f"mult={mult}: edges={n_edges} vertices={n_vertices} "
            f"wall={wall:.1f}s bad={bad} "
            f"resident_after={n_rdds} rdds / {res_bytes / 1e6:.1f} MB",
            flush=True,
        )
        if bad:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
