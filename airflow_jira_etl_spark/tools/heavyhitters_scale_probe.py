"""Heavy-hitters scale probe: replicate the documents fixture N× (text
identical, doc_ids strided) and check the exact top-k algebra PLUS the
SpaceSaving/Misra-Gries degradation path against it.

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

Sketch checks per multiple (operators/heavy_hitters — the bounded-
memory path for vocabularies that outgrow the exact aggregate):

- **ample capacity** (≥ the fixture vocabulary): the sketch top-k must
  EQUAL the exact top-k with tight bounds (est == freq == hi) — no
  decrement ever fires, so approximate must mean exactly-right here;
- **starved capacity** (well below the vocabulary): every exact top-k
  gram above the containment threshold N/(capacity+1) must appear in
  the sketch's candidate set with valid bounds est ≤ freq ≤ hi — the
  no-false-negative guarantee under real eviction pressure;
- sketch wall is reported per multiple (Arrow-batched pandas fold —
  expected slower per row than the JVM exact path; the win it buys is
  O(capacity) memory, not speed).
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

AMPLE_CAPACITY = 4096  # fixture bigram vocabulary is ~930
# below the fixture bigram vocabulary (916 at sf0.001/0.01, 931 at
# sf0.1 — so eviction fires) while keeping the containment threshold
# 1/801 ~ 0.125% of mass under the head gram's share (0.134% at sf0.1,
# the tightest of the three fixtures), so the hot set the guarantee is
# checked on stays NON-empty at every sf
STARVED_CAPACITY = 800


def main(argv: list[str]) -> int:
    from airflow_jira_etl_spark.operators.heavy_hitters import (
        spacesaving_heavy_hitters,
        spacesaving_summary,
    )
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

        # sketch leg 1: ample capacity — must reproduce the exact
        # top-k bit-for-bit (same ordering convention) with d == 0
        t0 = time.monotonic()
        sk = spacesaving_heavy_hitters(
            corpus, k=len(got), capacity=AMPLE_CAPACITY
        ).collect()
        sk_wall = time.monotonic() - t0
        ok_ample = {r.gram: r.est for r in sk} == {
            g: f for g, (f, _d) in got.items()
        } and all(r.est == r.hi for r in sk)

        # sketch leg 2: starved capacity — exact top-k grams above the
        # threshold must all be candidates, with valid bounds
        cand = {
            r.gram: r for r in spacesaving_summary(
                corpus, capacity=STARVED_CAPACITY
            ).collect()
        }
        thr = next(iter(cand.values())).threshold if cand else 0.0
        hot = {g: f for g, (f, _d) in got.items() if f > thr}
        hits = sum(
            1
            for g, f in hot.items()
            if g in cand and cand[g].est <= f <= cand[g].hi
        )
        ok_starved = hits == len(hot) and hot

        print(
            f"mult={mult:3d}: wall {wall:6.2f}s "
            f"({wall / base_wall * base_mult / mult:4.2f}x/unit) "
            f"grams {len(got)} set {'OK' if ok_set else 'VIOLATED'} "
            f"scaling {'OK' if ok_freq else 'VIOLATED'} | "
            f"sketch {sk_wall:6.2f}s "
            f"ample {'OK' if ok_ample else 'VIOLATED'} "
            f"starved {hits}/{len(hot)} hot "
            f"{'OK' if ok_starved else 'VIOLATED'}"
        )
        if not (ok_set and ok_freq and ok_ample and ok_starved):
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
