"""IVF (inverted-file) approximate nearest neighbor: coarse k-means
quantizer + cluster-pruned search.

The second of the two standard ANN scale paths (the LSH-bucket variant
is queries/llm_extras.llm_sim_lsh_topk). Structure:

1. **Train** a coarse quantizer with a few Lloyd's iterations — the
   canonical ITERATIVE DataFrame workload: assign (broadcast centroids
   + per-vector argmax), re-center (posexplode → per-(cluster, position)
   average → reassemble). Nothing ever collects whole vector lists:
   the re-center shuffle carries (cluster, pos, partial avg) scalars,
   so cluster size is unbounded.
2. **Index**: every vector gets its nearest-centroid id — at rest this
   is a partition/bucket key, so each cluster's vectors are co-located.
3. **Search**: score the probe against k centroids (k rows — tiny,
   driver-side by design), then scan only the ``n_probe`` nearest
   clusters: the fact scan shrinks ~k/n_probe ×.

Determinism: centroids are seeded by ``vec_id % k`` (no RNG), Lloyd's
runs a FIXED number of iterations, ties break on cluster_id — same
result on every run/partitioning, which is what makes the operator
testable (rows-only; float scoring is engine-specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_jira_etl_spark.functions.similarity import cosine

N_ITERS = 2


def _recenter(assigned: DataFrame, vec_col: str) -> DataFrame:
    """(cluster_id, vectors) → (cluster_id, centroid) via element-wise
    mean; shuffles only (cluster, pos, sum, count) scalars."""
    ex = assigned.select(
        "cluster_id", F.posexplode(F.col(vec_col)).alias("pos", "x")
    )
    means = ex.groupBy("cluster_id", "pos").agg(F.avg("x").alias("m"))
    return means.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s.m
        ).alias("centroid")
    )


def assign_clusters(
    emb: DataFrame, centroids: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the (tiny) centroid
    table, score every (vector, centroid) pair, keep the argmax with a
    deterministic tie-break."""
    scored = emb.crossJoin(F.broadcast(centroids)).withColumn(
        "__sim", cosine(F.col(vec_col), F.col("centroid"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col("cluster_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__sim", "centroid")
    )


def train_quantizer(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Fixed-iteration Lloyd's. Returns (cluster_id, centroid)."""
    seeded = emb.withColumn("cluster_id", (F.col(id_col) % k).cast("int"))
    centroids = _recenter(seeded, vec_col)
    for _ in range(N_ITERS):
        assigned = assign_clusters(emb, centroids, id_col, vec_col)
        centroids = _recenter(assigned, vec_col)
    return centroids


def ivf_topk(
    spark: SparkSession,
    emb: DataFrame,
    probe_id: int,
    k_clusters: int,
    top_k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """End-to-end IVF search for one probe vector."""
    centroids = train_quantizer(emb, k_clusters).cache()
    indexed = assign_clusters(emb, centroids)
    probe = emb.where(F.col("vec_id") == probe_id).select(
        F.col("embedding").alias("p")
    )
    probe_clusters = [
        r.cluster_id
        for r in centroids.crossJoin(F.broadcast(probe))
        .select("cluster_id", cosine(F.col("centroid"), F.col("p")).alias("s"))
        .orderBy(F.col("s").desc(), F.col("cluster_id"))
        .limit(n_probe)
        .collect()
    ]
    return (
        indexed.where(F.col("cluster_id").isin(probe_clusters))
        .where(F.col("vec_id") != probe_id)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            "cluster_id",
            F.round(cosine(F.col("embedding"), F.col("p")) + F.lit(1e-9), 4).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(top_k)
    )
