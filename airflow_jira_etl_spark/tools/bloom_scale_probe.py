"""Bloom-decontamination scale probe: replicate the documents fixture
N× and diff the Bloom path against the exact path at each multiple.

Usage::

    python -m airflow_jira_etl_spark.tools.bloom_scale_probe \
        [sf_dir] [mults]

(default sf0.1 and 1,4,10). Replicas keep their text IDENTICAL but get
strided doc_ids, so each multiple has a different (larger) eval slice
(doc_id % 97 re-scatters per replica) — the bitset is re-sized per
multiple by the operator's own two-pass rule, which is exactly the
scale behavior under test. Three checks per multiple:

- **exactness invariant**: the Bloom path's (doc_id, n_matched_grams)
  set must equal the exact broadcast path's — false positives may
  occur per GRAM (that is the sketch's contract) but the output rows
  carry the exact counts, so any drift means the shared gram builder
  or the sizing rule broke;
- **contract booleans**: no_false_negatives and fp_rate_ok must be
  TRUE on every row at every multiple;
- **wall grows ~linearly** in corpus size (two linear gram scans + a
  fixed-size broadcast probe — nothing in the plan is quadratic).
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
    from airflow_jira_etl_spark.queries.llm_extras import (
        bloom_decontaminate,
        exact_decontaminate,
    )

    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    mults = [
        int(m) for m in (argv[2].split(",") if len(argv) > 2 else ["1", "4", "10"])
    ]

    spark = get_spark("bloom-scale-probe")
    docs = catalog.load(spark, sf_dir, "documents").select("doc_id", "text")
    stride = key_stride(docs, "doc_id")

    base_wall: float | None = None
    base_mult = mults[0]
    for mult in mults:
        corpus = replicate_with_stride(docs, "doc_id", mult, stride)
        t0 = time.monotonic()
        bloom = bloom_decontaminate(spark, corpus)
        exact = exact_decontaminate(spark, corpus)
        # distributed diff — no driver-side materialization of the
        # matched-doc set (it grows with the corpus)
        diff = (
            bloom.select("doc_id", "n_matched_grams")
            .join(
                exact.withColumnRenamed("n_matched_grams", "exact_cnt"),
                "doc_id",
                "full_outer",
            )
            .where(
                F.col("n_matched_grams").isNull()
                | F.col("exact_cnt").isNull()
                | (F.col("n_matched_grams") != F.col("exact_cnt"))
            )
            .count()
        )
        contract = bloom.agg(
            F.count("*").alias("rows"),
            F.min("no_false_negatives").alias("nfn"),
            F.min("fp_rate_ok").alias("fp"),
        ).collect()[0]
        wall = time.monotonic() - t0
        if base_wall is None:
            base_wall = wall
        ok = diff == 0 and (
            contract["rows"] == 0
            or (bool(contract["nfn"]) and bool(contract["fp"]))
        )
        print(
            f"mult={mult:3d}: wall {wall:6.2f}s "
            f"({wall / base_wall * base_mult / mult:4.2f}x/unit) "
            f"matched-docs {contract['rows']} diff-vs-exact {diff} "
            f"contract {'OK' if ok else 'VIOLATED'}"
        )
        if not ok:
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
