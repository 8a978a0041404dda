"""Paragraph-dedup scale probe: replicate the documents fixture N× and
measure wall time + the first-occurrence invariant at each multiple.

Usage::

    python -m airflow_jira_etl_spark.tools.paragraph_scale_probe \
        [sf_dir] [mults]

(default sf0.1 and 1,4,10). Replicas keep their text IDENTICAL — the
heavy-duplication regime paragraph dedup exists for: every replica
beyond the first contributes segments that all lose the
first-occurrence race to replica 0 (lowest doc_id stride). Two things
are checked per multiple:

- **wall time grows ~linearly** in corpus size (the operator is one
  explode, one combining aggregate, one join, one reassembly groupBy —
  nothing quadratic hides in the pair space because there IS no pair
  space, unlike the minhash family's candidate join);
- **the kept-segment invariant**: sum(n_kept) at N× must equal
  sum(n_kept) at 1× — all survivors live in the first replica — while
  sum(n_segs) scales by N exactly. A violated invariant means the
  argmin tie-break leaked across replicas (the encoded-BIGINT ordering
  broke), not just a perf drift.
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
    from airflow_jira_etl_spark.queries.llm_extras import paragraph_dedup

    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    mults = [
        int(m) for m in (argv[2].split(",") if len(argv) > 2 else ["1", "4", "10"])
    ]

    spark = get_spark("paragraph-scale-probe")
    docs = catalog.load(spark, sf_dir, "documents").select("doc_id", "text")
    stride = key_stride(docs, "doc_id")

    base_kept: int | None = None
    base_wall: float | None = None
    base_segs: int | None = None
    base_mult = mults[0]
    for mult in mults:
        corpus = replicate_with_stride(docs, "doc_id", mult, stride)
        t0 = time.monotonic()
        agg = paragraph_dedup(corpus).agg(
            F.sum("n_segs").alias("segs"),
            F.sum("n_kept").alias("kept"),
            F.count("*").alias("docs"),
        ).collect()[0]
        wall = time.monotonic() - t0
        if base_kept is None:
            base_kept, base_wall, base_segs = agg["kept"], wall, agg["segs"]
        # kept is base-independent (survivors all live in replica 0, so
        # kept(N×) == kept(1×) for every N); segs scales exactly
        # linearly, so compare by RATIO to the first multiple rather
        # than assuming mults[0] == 1 (ADVICE r13: a '4,10' list must
        # expect segs(10×) == segs(4×) * 10/4, not segs(4×) * 10)
        ok_kept = agg["kept"] == base_kept
        ok_segs = agg["segs"] * base_mult == base_segs * mult
        print(
            f"mult={mult:3d}: wall {wall:6.2f}s ({wall / base_wall:4.1f}x) "
            f"docs {agg['docs']} segs {agg['segs']} kept {agg['kept']} "
            f"kept-invariant {'OK' if ok_kept else 'VIOLATED'} "
            f"segs-linear {'OK' if ok_segs else 'VIOLATED'}"
        )
        if not (ok_kept and ok_segs):
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
