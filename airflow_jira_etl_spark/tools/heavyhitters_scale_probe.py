"""Heavy-hitters scale probe: replicate the documents fixture N× (text
identical, doc_ids strided) and check the exact top-k algebra.

Usage::

    python -m airflow_jira_etl_spark.tools.heavyhitters_scale_probe \
        [sf_dir] [mults]

(default sf0.1 and 1,4,10). With identical replicas the top-k is a
pure scaling of the base run, which pins BOTH the aggregate and the
boundary at once (ratios computed against the FIRST multiple, so a
'4,10' list works — the ADVICE-r13 base-multiple rule):

- the selected gram SET is invariant across multiples (every freq
  scales uniformly, so no gram can cross the k boundary);
- freq(N×) * base_mult == freq(base) * N exactly, per gram;
- doc_freq scales the same way (each replica contributes the same
  containing docs under new ids);
- wall grows ~linearly (explode + partial-agg + k-heap; nothing
  quadratic, no growing state beyond the distinct-gram aggregate).
"""

from __future__ import annotations

import sys
import time

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.session import get_spark
from airflow_jira_etl_spark.tools.replication import (
    key_stride,
    replicate_with_stride,
)


def main(argv: list[str]) -> int:
    from airflow_jira_etl_spark.queries.llm_ops import heavy_hitters

    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    mults = [
        int(m) for m in (argv[2].split(",") if len(argv) > 2 else ["1", "4", "10"])
    ]

    spark = get_spark("heavyhitters-scale-probe")
    docs = catalog.load(spark, sf_dir, "documents").select("doc_id", "text")
    stride = key_stride(docs, "doc_id")

    base: dict | None = None
    base_wall: float | None = None
    base_mult = mults[0]
    for mult in mults:
        corpus = replicate_with_stride(docs, "doc_id", mult, stride)
        t0 = time.monotonic()
        rows = heavy_hitters(corpus).collect()  # k rows — driver-safe
        wall = time.monotonic() - t0
        got = {r.gram: (r.freq, r.doc_freq) for r in rows}
        if base is None:
            base, base_wall = got, wall
        ok_set = set(got) == set(base)
        ok_freq = all(
            got[g][0] * base_mult == base[g][0] * mult
            and got[g][1] * base_mult == base[g][1] * mult
            for g in base
            if g in got
        )
        print(
            f"mult={mult:3d}: wall {wall:6.2f}s "
            f"({wall / base_wall * base_mult / mult:4.2f}x/unit) "
            f"grams {len(got)} set {'OK' if ok_set else 'VIOLATED'} "
            f"scaling {'OK' if ok_freq else 'VIOLATED'}"
        )
        if not (ok_set and ok_freq):
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
