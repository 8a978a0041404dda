"""Dedup-family scale probe: self-union the documents fixture N× and
measure the signature pass, candidate generation and verified-pair
output at each multiple.

Usage::

    python -m airflow_jira_etl_spark.tools.scale_probe [sf_dir] [mults]

(default sf0.1 and 1,4,10). Each replica's text gets a distinct suffix
word, so cross-replica documents are true near-duplicates of their
twins — the probe therefore checks BOTH that wall time grows
sub-linearly in corpus size and that the band join's candidate set
stays equal to the true near-dup set (zero false positives). Results
for round 5 are recorded in PLANS.md ("10× scale experiment").
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.session import get_spark
from airflow_jira_etl_spark.tools.replication import (
    key_stride,
    replicate_with_stride,
)


def main(argv: list[str]) -> int:
    from airflow_jira_etl_spark.queries.llm_ops import (
        minhash_candidates_portable,
        minhash_verify,
        ngram_jaccard_pairs,
    )

    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(m) for m in (argv[2].split(",") if len(argv) > 2 else ["1", "4", "10"])]

    spark = get_spark("scale-probe")
    docs = catalog.load(spark, sf_dir, "documents").select("doc_id", "text")
    # stride derivation + union fold shared with the TPC-H probe
    # (tools/replication.py — data-derived stride, never a constant)
    stride = key_stride(docs, "doc_id")

    def corpus(mult: int):
        return replicate_with_stride(
            docs,
            "doc_id",
            mult,
            stride,
            # distinct suffix word per replica: cross-replica documents
            # are true NEAR-duplicates of their twins, not exact copies
            transform=lambda df, r: df.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" replica{r}"))
            ),
        )

    for mult in mults:
        c = corpus(mult).repartition(32).cache()
        n = c.count()
        t0 = time.time()
        np_ = ngram_jaccard_pairs(c).count()
        t_ng = time.time() - t0
        # candidates are cached so cand_s times signature + band join
        # exactly once and mh_s times ONLY the Jaccard verify — the
        # earlier form re-ran the candidate pipeline inside the pair
        # timing, making the two numbers overlap and order-dependent
        cand = minhash_candidates_portable(c).cache()
        t0 = time.time()
        nc = cand.count()
        t_cand = time.time() - t0
        t0 = time.time()
        npair = minhash_verify(cand).count()
        t_mh = time.time() - t0
        cand.unpersist()
        print(
            f"RESULT mult={mult} docs={n} ngram_pairs={np_} "
            f"ngram_s={t_ng:.1f} mh_cand={nc} cand_s={t_cand:.1f} "
            f"mh_pairs={npair} mh_s={t_mh:.1f}",
            flush=True,
        )
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
