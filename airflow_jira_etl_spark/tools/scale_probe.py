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


def probe_embeddings(spark, sf_dir: str, mults: list[int]) -> None:
    """Hyperplane-LSH pairs probe: replicate the embeddings fixture N×
    (each replica's vector ROTATED by r positions so replicas spread
    across buckets like genuinely new vectors would) and measure the
    candidate-pair count under the ADAPTIVE bucket geometry
    (_hp_n_bits) vs the fixed 64-bucket geometry it replaced. The
    adaptive design keeps mean bucket ≈ target, so candidates grow
    ~n·target/2 (linear, up to the power-of-2 rounding ≤2×) where the
    fixed geometry grows ~n²/128."""
    from airflow_jira_etl_spark.queries.llm_ops import (
        _HP_MIN_BITS,
        _hp_n_bits,
        _hyperplane_bucket_spark,
    )

    emb = catalog.load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    stride = key_stride(emb, "vec_id")
    dim = 64  # declared contract (catalog.SCHEMAS embeddings)

    def corpus(mult: int):
        def rotate(df, r: int):
            # r can exceed dim at large mults: rotate by r % dim and
            # sign-flip every second dim-block so replica r in
            # [dim, 2*dim) is still a genuinely new vector. The trick
            # EXHAUSTS at r = 2*dim — replica r would be an exact copy
            # of replica r - 2*dim (same rotation, same parity),
            # silently faking near-dup candidates in every bucket and
            # invalidating the geometry comparison — so refuse rather
            # than fabricate
            if r >= 2 * dim:
                raise ValueError(
                    f"scale_probe: replica {r} >= 2*dim ({2 * dim}) "
                    f"would duplicate replica {r - 2 * dim} exactly — "
                    f"the rotate+flip family supports at most "
                    f"{2 * dim} distinct replicas; lower the mult"
                )
            if r == 0:
                return df
            k = r % dim
            col = F.col("embedding")
            if k:
                col = F.concat(
                    F.slice("embedding", k + 1, dim - k),
                    F.slice("embedding", 1, k),
                )
            if (r // dim) % 2:
                col = F.transform(col, lambda x: -x)
            return df.withColumn("embedding", col)

        return replicate_with_stride(emb, "vec_id", mult, stride, transform=rotate)

    for mult in mults:
        c = corpus(mult).repartition(32).cache()
        n = c.count()
        for label, bits in (
            ("adaptive", _hp_n_bits(n)),
            ("fixed64", _HP_MIN_BITS),
        ):
            sig = c.withColumn(
                "bucket", _hyperplane_bucket_spark(bits)
            ).cache()
            sig.count()
            a, b = sig.alias("a"), sig.alias("b")
            t0 = time.time()
            ncand = a.join(
                b,
                (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            ).count()
            t = time.time() - t0
            print(
                f"RESULT emb mult={mult} n={n} geom={label} bits={bits} "
                f"candidates={ncand} cand_per_row={ncand / max(n, 1):.1f} "
                f"join_s={t:.1f}",
                flush=True,
            )
            sig.unpersist()
        spark.catalog.clearCache()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--embeddings":
        spark = get_spark("scale-probe")
        sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
        ms = [
            int(m)
            for m in (sys.argv[3].split(",") if len(sys.argv) > 3 else ["1", "4", "10"])
        ]
        probe_embeddings(spark, sf, ms)
        sys.exit(0)
    sys.exit(main(sys.argv))
