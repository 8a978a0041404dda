"""Bounded-memory heavy hitters — the SpaceSaving/Misra-Gries
degradation path for ``llm_heavy_hitters``.

The exact operator (``queries/llm_ops.heavy_hitters``) is a one-shuffle
hash aggregate whose state is linear in DISTINCT grams — the right
plan whenever the vocabulary head fits executor memory, and the
oracle-able reference this sketch is property-tested against
(tests/test_heavy_hitters_sketch.py). On an adversarially unbounded
vocabulary (100 TB of web text has billions of distinct bigrams) that
state outgrows memory; the standard degradation is a MERGEABLE
frequency summary of fixed size, trading memory for eps-approximate
tail counts.

This module implements the Misra-Gries form (the decrement-based
equivalent of SpaceSaving — identical guarantees, and its merge is a
one-liner that vectorizes in pandas):

- **per partition** (``mapInPandas``, Arrow-batched): fold each batch's
  exact ``value_counts`` into a running summary capped at ``capacity``
  counters; when the summary overflows, subtract the (capacity+1)-th
  largest count ``v`` from every counter and drop the non-positive
  ones. Each such decrement event removes ≥ (capacity+1)·v gram
  occurrences from the stream's mass, so the per-partition decrement
  total obeys  d_p ≤ N_p / (capacity+1).
- **globally**: partition summaries are tiny (≤ capacity rows each),
  so the combine is ONE shuffle of n_partitions·capacity rows —
  groupBy(gram).sum, never touching the full gram stream again.

Guarantees carried into the output (and pinned by the property tests):

- ``est`` is a LOWER bound:  est(g) ≤ freq(g)  (MG only undercounts);
- ``hi = est + Σ_p d_p`` is an UPPER bound:  freq(g) ≤ hi(g) — for
  partitions where g survived, true_p ≤ est_p + d_p; where it was
  evicted, true_p ≤ d_p;
- **no false negatives above the threshold**: any gram with
  freq(g) > N/(capacity+1) must appear in the candidate set — by
  pigeonhole it beats N_p/(capacity+1) in at least one partition, and
  an item can only be absent from a partition summary if its count
  there is ≤ d_p ≤ N_p/(capacity+1).

The candidate SET depends on partitioning (like every summary sketch),
so this is an operator + probe, not a registered query — the exact
form keeps the SQL oracle (the agg_approx_distinct precedent:
engine-specific outputs get contract checks, not value hashes).

Reference scope note: the reference repo (Airflow ETL glue) has no
analytics surface; this operator extends the engine's LLM-pipeline
family per the brief, with the exact query as its semantic anchor.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one summary row per surviving counter, plus ONE meta row per
# partition (gram NULL — concat_ws never yields NULL, so the marker
# cannot collide with a real gram) carrying the partition's stream
# mass and decrement total
_SUMMARY_SCHEMA = "gram string, est long, d long, n long"


def bigram_stream(documents: DataFrame) -> DataFrame:
    """The gram stream the sketch summarizes — SAME tokenization as the
    exact ``heavy_hitters`` body (in-array bigrams over a whitespace
    split, no self-join, no window lag); the equivalence property test
    fails if the two drift apart."""
    return (
        documents.select(F.split(F.lower(F.col("text")), " ").alias("ws"))
        .where(F.size("ws") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1), i -> "
                    "concat_ws(' ', slice(ws, i, 2)))"
                )
            ).alias("gram")
        )
    )


def _mg_partition(capacity: int):
    """Partition-local Misra-Gries fold, vectorized per Arrow batch:
    merging a batch's exact value_counts into the summary IS the MG
    merge of two summaries (the batch is a perfect one), so the
    classic per-item loop collapses to pandas Series arithmetic."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary = pd.Series(dtype="int64")
        d_total = 0
        n_total = 0
        for batch in batches:
            grams = batch["gram"]
            n_total += len(grams)
            summary = summary.add(grams.value_counts(), fill_value=0)
            if len(summary) > capacity:
                # v = the (capacity+1)-th largest count; subtracting it
                # everywhere and dropping ≤0 keeps exactly ≤ capacity
                # counters and removes ≥ (capacity+1)·v stream mass
                v = int(summary.nlargest(capacity + 1).iloc[-1])
                summary = summary - v
                summary = summary[summary > 0]
                d_total += v
        out = pd.DataFrame(
            {
                "gram": summary.index.astype(str),
                "est": summary.astype("int64").values,
                "d": d_total,
                "n": 0,
            }
        )
        meta = pd.DataFrame(
            {"gram": [None], "est": [0], "d": [d_total], "n": [n_total]}
        )
        yield pd.concat([out, meta], ignore_index=True)

    return fold


def spacesaving_summary(
    documents: DataFrame, capacity: int = 4096
) -> DataFrame:
    """Merged global candidate summary: one row per candidate gram with
    guaranteed bounds ``est ≤ freq ≤ hi``, plus the containment
    ``threshold`` (= N/(capacity+1)): every gram whose true frequency
    exceeds it is guaranteed present. Columns: gram, est, hi,
    threshold."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    parts = bigram_stream(documents).mapInPandas(
        _mg_partition(capacity), schema=_SUMMARY_SCHEMA
    )
    # ≤ (capacity+1)·n_partitions rows from here on — a driver-safe
    # cache, same footprint class as the IVF centroid meta
    parts = parts.cache()
    totals = parts.where(F.col("gram").isNull()).agg(
        F.sum("d").alias("d_all"), F.sum("n").alias("n_all")
    )
    merged = (
        parts.where(F.col("gram").isNotNull())
        .groupBy("gram")
        .agg(F.sum("est").alias("est"))
    )
    # one-row broadcast of the global decrement/mass totals — the
    # runtime-filter crossJoin shape (cf. the Bloom probe's bitset row)
    return merged.crossJoin(F.broadcast(totals)).select(
        "gram",
        "est",
        (F.col("est") + F.col("d_all")).alias("hi"),
        (F.col("n_all") / F.lit(capacity + 1)).alias("threshold"),
    )


def spacesaving_heavy_hitters(
    documents: DataFrame, k: int = 100, capacity: int = 4096
) -> DataFrame:
    """Top-k by estimated frequency with guaranteed bounds — the
    drop-in degradation of the exact ``heavy_hitters`` top-k (same
    ordering convention: est desc, gram asc; TakeOrderedAndProject,
    never a global sort). With capacity ≥ the distinct-gram count the
    summary is exact (d_p = 0 in every partition), so est == freq and
    the result equals the exact top-k minus the doc_freq column."""
    return (
        spacesaving_summary(documents, capacity)
        .orderBy(F.col("est").desc(), F.col("gram").asc())
        .limit(k)
    )
