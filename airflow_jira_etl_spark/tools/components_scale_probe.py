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

(default mults ``1,5,20`` → ~88k/440k/1.76M directed input edges).
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


def main(argv: list[str]) -> int:
    import airflow_jira_etl_spark.operators.components as C

    from airflow_jira_etl_spark.checkpoint import release_local_checkpoint

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
