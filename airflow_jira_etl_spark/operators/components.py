"""Connected components over duplicate-pair edges — dedup clustering.

The last step of dedup at scale: MinHash/LSH emits PAIRS, but the
deliverable is CLUSTERS (each near-duplicate group keeps one canonical
document). Transitive closure needs connected components; the
DataFrame-iterative form is label propagation to the minimum id:

    label(v) ← min(label(v), min over neighbors(label(u)))

iterated to fixpoint. Each iteration is two narrow shuffles (edges ⋈
labels, then a min-aggregate per vertex); iteration count is bounded
by the longest path in a component (near-dup clusters are shallow, so
3-5 iterations close almost everything; the cap is a safety rail).

This is the second iterative-algorithm exemplar in the engine (with
operators/ivf.py) — convergence-checked with a single count per
iteration, the standard driver-side loop pattern for fixpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERS = 10


def connected_components(pairs: DataFrame, max_iters: int = MAX_ITERS) -> DataFrame:
    """(id1, id2) undirected edges → (id, component) with component =
    min id reachable. Deterministic for any edge order.

    Shuffle partitions are scoped down for the fixpoint loop: each
    iteration is a small join + aggregate over |dup-pairs| rows, and
    per-iteration scheduling overhead at CPU-count partitions dominates
    the actual work. (At true scale, size this to the edge count.)"""
    spark = pairs.sparkSession
    from airflow_jira_etl_spark.session import scoped_shuffle_partitions

    with scoped_shuffle_partitions(spark, 8):
        return _connected_components(pairs, max_iters)


def _connected_components(pairs: DataFrame, max_iters: int) -> DataFrame:
    edges = (
        pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
        .union(pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels


def dedup_clusters(pairs: DataFrame, all_ids: DataFrame, id_col: str) -> DataFrame:
    """Full dedup decision: every id → (component, is_canonical).
    Ids with no duplicate edge are their own singleton component; the
    canonical member of each component is its minimum id."""
    comp = connected_components(pairs)
    return (
        all_ids.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            "id",
            F.coalesce("component", F.col("id")).alias("component"),
        )
        .withColumn("is_canonical", F.col("id") == F.col("component"))
    )
