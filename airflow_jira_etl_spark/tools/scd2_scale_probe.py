"""SCD2 merge scale probe: the broadcast composition vs the full-outer
join it replaced, as the dimension grows.

Round 11 found the merge's ``cur FULL OUTER JOIN broadcast(upd)`` was
silently a SortMergeJoin (Spark ignores broadcast hints on full outer
— BroadcastHashJoin does not support that join type), shuffling AND
sorting the whole dimension per merge. The rewrite composes
broadcast-supported shapes only (left outer + key-only semi/anti; see
operators/scd2.py). This probe measures both forms on a synthetic
dimension at growing sizes with a fixed small change batch — the
operator's design point (billions of members, thousands of daily
changes) — and checks they produce identical results.

Expected shape: the broadcast form's wall grows like a SCAN of the
dimension (it reads it twice, once key-only, and never exchanges it);
the full-outer form pays a full hash exchange + sort of the dimension
on top, so its wall diverges as the dimension grows and its plan
carries SortMergeJoin where the broadcast form's carries none.

Usage::

    python -m airflow_jira_etl_spark.tools.scd2_scale_probe [mults] [src]

``mults`` defaults to ``1,5,20`` (dimension = 1M rows x mult; batch
fixed at 2 000 changes: half updating existing keys, half brand-new).
``src`` is ``parquet`` (default) or ``range``: the range-generated
dimension of the original r11 run understates the contrast twice over
— a Range source has no column pruning for the broadcast form's
key-only second scan to win, and nothing I/O-shaped for the full-outer
form's exchange to amplify. ``parquet`` materializes the dimension to
scratch once per mult and both arms read it back, so the probe
measures the production shape: a file-backed dimension where
ReadSchema shows the pruned scan and the shuffle pays real
serialization.
"""

from __future__ import annotations

import sys
import time
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_jira_etl_spark.session import get_spark

BASE_DIM = 1_000_000
N_CHANGES = 2_000
EFFECTIVE = "2024-06-01"


def build_dim(spark, mult: int) -> DataFrame:
    n = BASE_DIM * mult
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("string").alias("attr"),
        F.lit("2020-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def parquet_dim(spark, mult: int) -> DataFrame:
    """Materialize build_dim(mult) to scratch parquet (once — reruns
    reuse it via a row-count sentinel in the path) and read it back:
    the file-backed dimension the operator actually merges against in
    production. Written WITHOUT sorting/partitioning games so neither
    arm gets an accidental clustering advantage."""
    import os

    from airflow_jira_etl_spark.scratch import SCRATCH

    n = BASE_DIM * mult
    path = os.path.join(SCRATCH, f"scd2_probe_dim_{n}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build_dim(spark, mult).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def build_changes(spark, mult: int) -> DataFrame:
    n = BASE_DIM * mult
    # half the batch updates existing keys (attrs differ -> close+open),
    # half is brand-new keys past the dimension's range (insert path) —
    # both sides of the merge's fan-out exercised at every multiple
    upd = spark.range(N_CHANGES // 2).select(
        (F.col("id") * (n // (N_CHANGES // 2))).alias("k"),
        F.lit("changed").alias("attr"),
    )
    new = spark.range(N_CHANGES // 2).select(
        (F.col("id") + n).alias("k"), F.lit("brand-new").alias("attr")
    )
    return upd.unionByName(new)


def full_outer_merge(
    dim: DataFrame, changes: DataFrame, key: str, attrs: list[str], effective: str
) -> DataFrame:
    """The RETIRED form, kept here as the probe's comparison arm: one
    full-outer join whose broadcast hint Spark silently ignores."""
    from airflow_jira_etl_spark.operators.scd2 import VERSION_COLS
    from airflow_jira_etl_spark.operators.upsert import upsert

    eff = F.lit(effective).cast("date")
    cur = dim.where(F.col("is_current").eqNullSafe(F.lit(True))).withColumn(
        "__in_dim", F.lit(True)
    )
    hist = dim.where(~F.col("is_current").eqNullSafe(F.lit(True)))
    deduped = upsert(changes.limit(0), changes, key)
    upd = deduped.select(
        F.col(key),
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.lit(True).alias("__in_upd"),
    )
    j = cur.join(F.broadcast(upd), on=key, how="full_outer")
    in_dim = F.col("__in_dim").isNotNull()
    in_upd = F.col("__in_upd").isNotNull()
    differs = reduce(
        lambda a, b: a | b,
        [~F.col(a).eqNullSafe(F.col(f"__u_{a}")) for a in attrs],
    )
    changed = in_dim & in_upd & differs
    passthrough = j.where(in_dim & ~changed).select(key, *attrs, *VERSION_COLS)
    closed = j.where(changed & in_dim).select(
        key, *attrs, "valid_from", eff.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = j.where(in_upd & (~in_dim | differs)).select(
        key,
        *[F.col(f"__u_{a}").alias(a) for a in attrs],
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return (
        hist.select(key, *attrs, *VERSION_COLS)
        .unionByName(passthrough)
        .unionByName(closed)
        .unionByName(opened)
    )


def _summary(df: DataFrame):
    """Order-free digest for the equivalence check: counts + checksums
    per (is_current, valid_to-nullness) class — collecting millions of
    rows to the driver would measure Arrow transfer, not the merge."""
    return sorted(
        tuple(r)
        for r in df.groupBy("is_current", F.col("valid_to").isNull())
        .agg(
            F.count("*").alias("n"),
            F.sum(F.hash("k", "attr", "valid_from").cast("long")).alias("chk"),
        )
        .collect()
    )


def main(argv: list[str]) -> int:
    from airflow_jira_etl_spark.operators.scd2 import scd2_merge

    mults = [int(m) for m in (argv[1].split(",") if len(argv) > 1 else ["1", "5", "20"])]
    src = argv[2] if len(argv) > 2 else "parquet"
    if src not in ("parquet", "range"):
        raise SystemExit(f"src must be parquet|range, got {src!r}")
    spark = get_spark("scd2-scale-probe")
    # pay codegen once, untimed
    scd2_merge(
        build_dim(spark, 1).limit(1000), build_changes(spark, 1), "k",
        ["attr"], EFFECTIVE,
    ).count()
    make_dim = parquet_dim if src == "parquet" else build_dim
    for mult in mults:
        if src == "parquet":
            parquet_dim(spark, mult)  # materialize untimed
        dim = make_dim(spark, mult)
        changes = build_changes(spark, mult)
        t0 = time.perf_counter()
        bc = scd2_merge(dim, changes, "k", ["attr"], EFFECTIVE)
        bc_sum = _summary(bc)
        bc_wall = time.perf_counter() - t0
        bc_plan = bc._jdf.queryExecution().executedPlan().toString()
        t0 = time.perf_counter()
        fo = full_outer_merge(dim, changes, "k", ["attr"], EFFECTIVE)
        fo_sum = _summary(fo)
        fo_wall = time.perf_counter() - t0
        fo_plan = fo._jdf.queryExecution().executedPlan().toString()
        if bc_sum != fo_sum:
            print(f"DIVERGENCE at mult={mult}: {bc_sum} vs {fo_sum}")
            return 1
        # the broadcast form's key-probe scan must be pruned to
        # (k, is_current) on a file source — the pruning advantage the
        # range source could never show — and the dimension must be
        # scanned exactly TWICE (the r11 union-branch form silently
        # re-executed the join per branch: five scans)
        pruned = "ReadSchema: struct<k:bigint,is_current:boolean>" in bc_plan
        print(
            f"RESULT src={src} mult={mult} dim={BASE_DIM * mult} "
            f"broadcast_s={bc_wall:.1f} fullouter_s={fo_wall:.1f} "
            f"broadcast_smj={bc_plan.count('SortMergeJoin')} "
            f"fullouter_smj={fo_plan.count('SortMergeJoin')} "
            f"bc_dim_scans={bc_plan.count('FileScan')} "
            f"keyonly_scan_pruned={pruned}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
