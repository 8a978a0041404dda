"""Reservoir-sample scale probe: replicate the documents fixture N×
(strided doc_ids → fresh hash draws per replica) and check the
reservoir algebra under growth.

Usage::

    python -m airflow_jira_etl_spark.tools.reservoir_scale_probe \
        [sf_dir] [mults]

(default sf0.1 and 1,4,10). Checks per multiple:

- **cap invariant**: every language holds exactly min(k, group size)
  rows with rn a dense 1..cap prefix (checked distributed);
- **displacement-only growth**: the base-replica documents (doc_id <
  stride) still selected at N× are a SUBSET of the base run's
  selection — growing the corpus may only push members off the
  boundary, never admit a base doc that wasn't already in (the
  reservoir property; both sides are ≤ k·|langs| rows, driver-safe);
- **wall grows ~linearly** — the WindowGroupLimit partial prune keeps
  the per-lang sort input at k rows per input partition, so the sort
  cost cannot grow superlinearly with the corpus.
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
    from airflow_jira_etl_spark.queries.sampling import (
        _RESERVOIR_K,
        reservoir_sample,
    )

    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    mults = [
        int(m) for m in (argv[2].split(",") if len(argv) > 2 else ["1", "4", "10"])
    ]

    spark = get_spark("reservoir-scale-probe")
    docs = catalog.load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    stride = key_stride(docs, "doc_id")

    base_sel: set | None = None
    base_wall: float | None = None
    base_mult = mults[0]
    for mult in mults:
        corpus = replicate_with_stride(docs, "doc_id", mult, stride)
        t0 = time.monotonic()
        sample = reservoir_sample(corpus).cache()
        # cap: per-lang sample size == min(k, group size), rn dense.
        # NULL lang is a real reservoir group (see reservoir_sample),
        # so the join must be null-safe (eqNullSafe — a plain "lang"
        # equi-join would split the NULL group into two half-rows) and
        # the counters coalesced to distinct sentinels so a group
        # present on only one side COUNTS as a violation instead of
        # evaluating the predicate to NULL and slipping through
        # (ADVICE r14).
        want = corpus.groupBy("lang").agg(F.count("*").alias("n"))
        got = sample.groupBy(F.col("lang").alias("s_lang")).agg(
            F.count("*").alias("got"), F.max("rn").alias("max_rn")
        )
        sizes = (
            want.join(
                got, F.col("lang").eqNullSafe(F.col("s_lang")), "full_outer"
            )
            .where(
                (
                    F.coalesce(F.col("got"), F.lit(-1))
                    != F.least(
                        F.coalesce(F.col("n"), F.lit(-2)),
                        F.lit(_RESERVOIR_K),
                    )
                )
                | (
                    F.coalesce(F.col("max_rn"), F.lit(-1))
                    != F.coalesce(F.col("got"), F.lit(-2))
                )
            )
            .count()
        )
        picked = {
            (r.lang, r.doc_id)
            for r in sample.where(F.col("doc_id") < stride).collect()
        }
        wall = time.monotonic() - t0
        sample.unpersist()
        if base_sel is None:
            base_sel, base_wall = picked, wall
        ok_cap = sizes == 0
        ok_disp = picked <= base_sel
        print(
            f"mult={mult:3d}: wall {wall:6.2f}s "
            f"({wall / base_wall * base_mult / mult:4.2f}x/unit) "
            f"base-survivors {len(picked)} "
            f"cap {'OK' if ok_cap else 'VIOLATED'} "
            f"displacement {'OK' if ok_disp else 'VIOLATED'}"
        )
        if not (ok_cap and ok_disp):
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
