"""Whole-registry scale sweep: run EVERY registered query, unchanged,
against a mult× replicated fixture and report per-query wall growth.

Usage::

    python -m airflow_jira_etl_spark.tools.registry_scale_sweep \
        [sf_dir] [mult] [out.json] [shuffle_partitions]

(default sf0.1, 4×). The optional 4th arg forces MULTI-WAVE
scheduling (r15): local[32] at the default 32 shuffle partitions runs
every shuffle in one wave, which hides the skew-at-shuffle effects a
1000-executor cluster sees — one straggling partition stalls a whole
wave there. Passing e.g. 256 sets spark.sql.shuffle.partitions=256
AND drops the AQE advisory partition size to 1 MB; the advisory drop
matters because at sweep data volumes AQE's coalescer would otherwise
merge 256 small partitions straight back to one wave — on a real
cluster the data (not a conf) keeps partition counts high, and a tiny
advisory emulates exactly that data≫advisory regime while keeping
AQE (including its skew-join splitter) active, the production config. Round-14 origin: the Bloom decontamination
operator shipped oracle-green, plan-lint-green and bench-flat while
hiding TWO scale-killers (interpreted lambda probes; an O(n²)
map-lookup densification) that only a replicated-corpus TIMING run
exposed. Per-family probes assert exact invariants for the operators
they cover; this sweep is the coarse net for everything else — the
per-unit wall ratio wall(mult×) / (wall(1×) · mult) should sit at or
below ~1 for any operator whose work is ∝ input rows, and a large
ratio is the same smell the Bloom autopsy started from.

Fixture construction (tpch_scale_probe's materialization, extended to
every row-scaling table so the queries run UNCHANGED via catalog.load):
orders+lineitem replicate on a SHARED o_orderkey stride (replica
lineitems reference their replica's orders), events on event_id,
documents on doc_id, embeddings on vec_id; the five dimension tables
symlink. Replica content is IDENTICAL — which is exactly why the
pair-emitting similarity/dedup families are SKIPPED here: under
identical replicas their candidate space grows ∝ mult² BY DESIGN
(every replica pairs with every other), so a wall blow-up is the
correct answer, not a defect. Each of those families has its own
invariant-checked probe (scale_probe, components_scale_probe,
paragraph/bloom probes, hp-adaptive-bits geometry) — the skip list
below names the probe that covers each skipped query.

Reading the report: ratios are single-pass walls on a shared-host
local[32]; treat < ~1.5 as linear-ish noise, and investigate anything
above that WITH a repro before calling it a regression (the Bloom
workflow: bisect the operator body stage by stage at the same
multiple). Queries with sub-second walls at both scales are reported
but never flagged — their ratios are dominated by job-scheduling
constants.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.session import get_spark
from airflow_jira_etl_spark.tools.replication import (
    key_stride,
    replicate_with_stride,
)

# query -> the invariant-checked probe that owns its scale story
SKIP_OUTPUT_BOUND = {
    "llm_dedup_minhash": "tools/scale_probe.py (candidate pruning)",
    "llm_dedup_simhash": "tools/scale_probe.py (bucket pair space)",
    "llm_dedup_ngram_jaccard": "tools/scale_probe.py (banded pairs)",
    "llm_containment_pairs": "tools/scale_probe.py (shared candidates)",
    "llm_sim_pairs_threshold": "blocked self-join; pair space ∝ mult²",
    "llm_sim_lsh_topk": "hyperplane buckets; test_hp_adaptive_bits",
    "llm_dedup_clusters": "tools/components_scale_probe.py",
    "llm_dedup_semantic_clusters": "tools/components_scale_probe.py",
    "join_self_dedup_pairs": "within-bucket self-join pair space",
}

# thresholds for flagging (see module docstring)
UNIT_RATIO_FLAG = 1.5
MIN_WALL_FLAG = 2.0


def build_scaled(spark, sf_dir: str, mult: int, out_dir: str) -> None:
    orders = catalog.load(spark, sf_dir, "orders")
    li = catalog.load(spark, sf_dir, "lineitem")
    stride = key_stride(orders, "o_orderkey")
    replicate_with_stride(orders, "o_orderkey", mult, stride).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "orders.parquet"))
    replicate_with_stride(li, "l_orderkey", mult, stride).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "lineitem.parquet"))
    for t, key in (
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ):
        df = catalog.load(spark, sf_dir, t)
        replicate_with_stride(df, key, mult, key_stride(df, key)).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{t}.parquet"))
    for t in catalog.TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(catalog.table_path(sf_dir, t), dst)


def _run_pass(spark, registry, sf_dir: str) -> dict[str, float]:
    walls: dict[str, float] = {}
    for name in sorted(registry.QUERIES):
        if name in SKIP_OUTPUT_BOUND:
            continue
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).count()
        walls[name] = round(time.perf_counter() - t0, 3)
        print(f"# {sf_dir.rsplit('/', 1)[-1]} {name}: {walls[name]:.2f}s",
              file=sys.stderr)
        # a pass leaves per-query caches behind (signature frames,
        # gram caches); clear so the NEXT query's wall is its own
        spark.catalog.clearCache()
    return walls


def main(argv: list[str]) -> int:
    from airflow_jira_etl_spark import registry

    registry.load_all_queries()
    sf_dir = os.path.abspath(argv[1] if len(argv) > 1 else "/root/testdata/sf0.1")
    mult = int(argv[2]) if len(argv) > 2 else 4
    out_json = argv[3] if len(argv) > 3 else None
    shuffle_parts = int(argv[4]) if len(argv) > 4 else None

    spark = get_spark("registry-scale-sweep")
    if shuffle_parts is not None:  # multi-wave mode (module docstring)
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m"
        )
    # compile-warm every query at the tiny sf (bench.py's convention)
    tiny = os.path.join(os.path.dirname(sf_dir), "sf0.001")
    if os.path.isdir(tiny):
        for name in sorted(registry.QUERIES):
            if name in SKIP_OUTPUT_BOUND:
                continue
            try:
                registry.QUERIES[name](spark, tiny).count()
            except Exception as exc:  # noqa: BLE001
                print(f"# warmup {name}: {exc}", file=sys.stderr)
        spark.catalog.clearCache()

    scaled = tempfile.mkdtemp(prefix=f"regsweep{mult}x_")
    try:
        build_scaled(spark, sf_dir, mult, scaled)
        base = _run_pass(spark, registry, sf_dir)
        big = _run_pass(spark, registry, scaled)
    finally:
        shutil.rmtree(scaled, ignore_errors=True)

    rows = {}
    suspects = []
    for name, w1 in base.items():
        wm = big.get(name)
        if wm is None:
            continue
        unit = wm / (w1 * mult) if w1 > 0 else float("inf")
        rows[name] = {"w1": w1, "wm": wm, "unit_ratio": round(unit, 2)}
        if unit > UNIT_RATIO_FLAG and wm > MIN_WALL_FLAG:
            suspects.append(name)

    # a single-pass wall after 140 queries of JVM/worker churn can
    # carry one-off transients (observed: a 0.8 s query reading 40 s
    # once at 30×); confirm every suspect with a fresh measurement on
    # a rebuilt fixture and keep the MIN — only a REPRODUCIBLE blow-up
    # is a finding
    flagged = []
    if suspects:
        scaled2 = tempfile.mkdtemp(prefix=f"regsweep{mult}x_confirm_")
        try:
            build_scaled(spark, sf_dir, mult, scaled2)
            for name in suspects:
                t0 = time.perf_counter()
                registry.QUERIES[name](spark, scaled2).count()
                wm2 = round(time.perf_counter() - t0, 3)
                spark.catalog.clearCache()
                wm = min(big[name], wm2)
                w1 = base[name]
                unit = wm / (w1 * mult) if w1 > 0 else float("inf")
                rows[name] = {
                    "w1": w1, "wm": wm, "unit_ratio": round(unit, 2),
                    "confirm_run": wm2,
                }
                if unit > UNIT_RATIO_FLAG and wm > MIN_WALL_FLAG:
                    flagged.append((unit, name, w1, wm))
                else:
                    print(f"CLEAR {name}: first pass {big[name]:.2f}s was a "
                          f"transient (confirm run {wm2:.2f}s)")
        finally:
            shutil.rmtree(scaled2, ignore_errors=True)
    for q, why in sorted(SKIP_OUTPUT_BOUND.items()):
        print(f"SKIP  {q}: output-bound under identical replicas — {why}")
    for unit, name, w1, wm in sorted(flagged, reverse=True):
        print(f"FLAG  {name}: {w1:.2f}s @1x -> {wm:.2f}s @{mult}x "
              f"(unit ratio {unit:.2f})")
    print(f"-- {len(rows)} queries at {mult}x: {len(flagged)} flagged, "
          f"{len(SKIP_OUTPUT_BOUND)} skipped (documented)")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"mult": mult, "sf_dir": sf_dir,
                       "shuffle_partitions": shuffle_parts,
                       "rows": rows,
                       "flagged": [n for _, n, _, _ in flagged]}, f, indent=1)
        print(f"wrote {out_json}")
    return 0 if not flagged else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
