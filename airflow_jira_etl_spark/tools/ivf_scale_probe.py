"""IVF scale probe: corpus grown N× with k_clusters grown ∝ √n — the
ANN scale path measured end-to-end.

Usage::

    python -m airflow_jira_etl_spark.tools.ivf_scale_probe [sf_dir] [mults]

(default sf0.1 and 1,4,10). The IVF contract at 100 TB is that a
search's cost is the PROBED DIRECTORIES, not the corpus: directory
count k grows with the corpus (the classic k ≈ √n rule keeps
per-directory row counts ∝ √n), so a fixed-n_probe search reads an
ever-smaller FRACTION of the data. This probe replicates the
embeddings fixture N× (vec_id strides; vectors duplicated exactly, so
brute force and IVF rank the same geometry), builds a fresh on-disk
index per multiple with k = 8·√mult, and reports:

- ``ivf_warm_s``: min-of-3 wall of the warm registered search shape
  (the versioned meta layout — zero bookkeeping jobs, pruned scan
  only),
- ``probed_rows`` / ``n_vecs``: the measured read fraction,
- ``brute_s``: broadcast-probe brute-force cosine top-k over the full
  corpus — the baseline the pruned search must beat and keep beating,
- ``recall``: 4-dp cosine-value multiset overlap of IVF vs brute-force
  top-10 (value-based, so exact-twin ties across replicas don't
  punish id permutations).

Evidence target: probed fraction shrinks as the corpus grows while
recall holds and ivf_warm_s stays ≈flat; brute_s grows with the
corpus.

Recall caveat, stated honestly: the fixture's vectors are random, so
the cosine landscape is near-flat and true top-10 neighbors scatter
uniformly across directories — recall for a structureless corpus
floors at ≈ n_probe/k (measured 0.30 at n_probe=2, k=8: the 0.25
floor plus ties). Replication adds exact twins (cos=1.0) that land in
the probe's own directory, so recall RISES with the multiple. Real
embedding corpora are clustered — that structure is the entire reason
IVF works — so these floors are the worst case, not the expectation.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.functions.rounding import fround
from airflow_jira_etl_spark.operators.ivf import (
    build_index,
    cosine,
    ivf_topk,
    rank_probe_clusters,
)
from airflow_jira_etl_spark.session import get_spark
from airflow_jira_etl_spark.tools.replication import (
    key_stride,
    replicate_with_stride,
)


def main(argv: list[str]) -> int:
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    mults = [
        int(m) for m in (argv[2].split(",") if len(argv) > 2 else ["1", "4", "10"])
    ]
    spark = get_spark("ivf-scale-probe")
    emb = catalog.load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    stride = key_stride(emb, "vec_id")
    root = tempfile.mkdtemp(prefix="ivf_scale_")
    try:
        for mult in mults:
            corpus = replicate_with_stride(emb, "vec_id", mult, stride)
            n_vecs = corpus.count()
            k = max(8, round(8 * mult**0.5))
            probe_id = corpus.agg(F.min("vec_id")).first()[0]
            path = f"{root}/x{mult}"

            # cold call materializes the index (k-means + partitioned
            # write); warm calls are the registered search shape
            t0 = time.time()
            ivf_topk(
                spark, corpus, probe_id, k, index_path=path, index_tag="probe"
            ).collect()
            build_s = time.time() - t0
            walls, ivf_rows = [], None
            for _ in range(3):
                t0 = time.time()
                ivf_rows = ivf_topk(
                    spark, corpus, probe_id, k, index_path=path, index_tag="probe"
                ).collect()
                walls.append(time.time() - t0)
            ivf_warm = min(walls)

            # measured read fraction: rows in the probed directories
            indexed, centroids = build_index(spark, corpus, k, path, "probe")
            probe = corpus.where(F.col("vec_id") == probe_id).select(
                F.col("embedding").alias("p")
            )
            pc = rank_probe_clusters(centroids, probe, n_probe=2)
            probed_rows = indexed.where(F.col("cluster_id").isin(pc)).count()

            t0 = time.time()
            brute = (
                corpus.where(F.col("vec_id") != probe_id)
                .crossJoin(F.broadcast(probe))
                .select(
                    # fround, not an inline copy of its constants: the
                    # recall comparison needs BOTH sides on the one
                    # rounding convention (functions/rounding.py)
                    fround(cosine(F.col("embedding"), F.col("p"))).alias(
                        "cos_sim"
                    )
                )
                .orderBy(F.col("cos_sim").desc())
                .limit(10)
                .collect()
            )
            brute_s = time.time() - t0
            got = sorted(round(r.cos_sim, 4) for r in ivf_rows)
            want = sorted(round(r.cos_sim, 4) for r in brute)
            hits, pool = 0, list(want)
            for v in got:
                if v in pool:
                    pool.remove(v)
                    hits += 1
            print(
                f"RESULT mult={mult} n_vecs={n_vecs} k={k} "
                f"probed_rows={probed_rows} "
                f"frac={probed_rows / n_vecs:.3f} build_s={build_s:.1f} "
                f"ivf_warm_s={ivf_warm:.2f} brute_s={brute_s:.2f} "
                f"recall={hits / len(want):.2f}",
                flush=True,
            )
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
