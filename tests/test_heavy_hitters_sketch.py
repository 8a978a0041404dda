"""SpaceSaving/Misra-Gries heavy hitters (operators/heavy_hitters) —
property tests against the exact registered body and a pure-Python
frequency reference.

The sketch's candidate SET is partitioning-dependent (like every
summary sketch), so there is no value-hash oracle; the contract is the
guarantee triple pinned here on corpora engineered to overflow the
summary:

- est(g) ≤ freq(g) ≤ hi(g) for every emitted candidate;
- any gram with freq(g) > N/(capacity+1) is PRESENT (no false
  negatives above the threshold — the Misra-Gries pigeonhole);
- with capacity ≥ the distinct-gram count the sketch IS the exact
  top-k (d_p = 0 everywhere, so est == hi == freq).
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from airflow_jira_etl_spark import registry
from tests.docsfix import write_docs_fixture

registry.load_all_queries()


def _py_freqs(rows) -> Counter:
    freq: Counter = Counter()
    for _doc_id, text, _lang, _src in rows:
        if text is None:
            continue
        ws = text.lower().split(" ")
        for i in range(len(ws) - 1):
            freq[ws[i] + " " + ws[i + 1]] += 1
    return freq


def _zipf_corpus(n_docs: int = 300, seed: int = 77):
    """A skewed vocabulary: a handful of hot bigrams (every doc leads
    with one) over a long tail of near-singletons — the shape that
    makes a bounded summary earn its guarantees."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        words = [f"hot{i % 3}", "head"]  # hot0/1/2 head: 100 each
        for _ in range(rng.randint(3, 8)):
            words.append(f"t{rng.randrange(2000):04d}")
        rows.append((i, " ".join(words), "en", "s"))
    rows.append((n_docs, None, "en", "s"))  # NULL text: no grams
    return rows


@pytest.fixture(scope="module")
def zipf(tmp_path_factory, spark):
    rows = _zipf_corpus()
    d = write_docs_fixture(str(tmp_path_factory.mktemp("sshh")), rows)
    from airflow_jira_etl_spark import catalog

    return catalog.load(spark, d, "documents"), _py_freqs(rows)


def test_exact_when_capacity_exceeds_vocabulary(zipf):
    """capacity ≥ |vocab| → no decrements anywhere → the sketch top-k
    equals the exact top-k with tight bounds."""
    from airflow_jira_etl_spark.operators.heavy_hitters import (
        spacesaving_heavy_hitters,
    )

    documents, truth = zipf
    got = spacesaving_heavy_hitters(documents, k=50, capacity=50_000).collect()
    expect = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert [(r.gram, r.est) for r in got] == expect
    assert all(r.est == r.hi for r in got), "no decrements → tight bounds"


def test_bounds_and_containment_under_overflow(zipf):
    """capacity far below |vocab| (~2000 tail grams): every candidate's
    bounds bracket the true count, and every gram above the threshold
    is present."""
    from airflow_jira_etl_spark.operators.heavy_hitters import (
        spacesaving_summary,
    )

    documents, truth = zipf
    n_total = sum(truth.values())
    capacity = 64
    cand = spacesaving_summary(documents, capacity=capacity).collect()
    assert 0 < len(cand) <= 64 * 64  # ≤ capacity · n_partitions
    threshold = cand[0].threshold
    assert threshold == pytest.approx(n_total / (capacity + 1))
    for r in cand:
        assert r.est <= truth[r.gram] <= r.hi, (
            f"{r.gram}: est={r.est} true={truth[r.gram]} hi={r.hi}"
        )
    got = {r.gram for r in cand}
    guaranteed = {g for g, c in truth.items() if c > threshold}
    assert guaranteed, "corpus must actually have super-threshold grams"
    assert guaranteed <= got, f"missing hitters: {guaranteed - got}"


def test_containment_is_partitioning_independent(zipf):
    """The no-false-negative guarantee must hold at ANY partitioning —
    1 partition (pure sequential MG) through many small ones (merge
    dominated)."""
    from airflow_jira_etl_spark.operators.heavy_hitters import (
        spacesaving_summary,
    )

    documents, truth = zipf
    n_total = sum(truth.values())
    capacity = 32
    guaranteed = {
        g for g, c in truth.items() if c > n_total / (capacity + 1)
    }
    assert guaranteed
    for n_parts in (1, 7, 32):
        cand = spacesaving_summary(
            documents.repartition(n_parts), capacity=capacity
        ).collect()
        got = {r.gram for r in cand}
        assert guaranteed <= got, (
            f"n_parts={n_parts}: missing {guaranteed - got}"
        )
        for r in cand:
            assert r.est <= truth[r.gram] <= r.hi


def test_gram_stream_matches_exact_tokenization(zipf):
    """bigram_stream is a reimplementation of the exact body's in-array
    gram build (the operator must not drift from its oracle-backed
    anchor): total gram mass and per-gram counts agree with the Python
    reference that the exact query is itself pinned to."""
    from pyspark.sql import functions as F

    from airflow_jira_etl_spark.operators.heavy_hitters import bigram_stream

    documents, truth = zipf
    got = {
        r.gram: r.n
        for r in bigram_stream(documents)
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == dict(truth)


def test_capacity_validation(zipf):
    from airflow_jira_etl_spark.operators.heavy_hitters import (
        spacesaving_summary,
    )

    documents, _ = zipf
    with pytest.raises(ValueError, match="capacity"):
        spacesaving_summary(documents, capacity=0)
