"""Cross-engine parity for the portable dedup hash families on
GENERATED corpora — not just the shipped fixture.

The driver's fixture generator has changed between rounds (events ts
unit, documents vocabulary), and the minhash/ngram oracles are only
trustworthy if Spark and DuckDB agree on ANY (doc_id, text) input.
These tests register a synthetic corpus as the DuckDB ``documents``
view and run the exact oracle SQL the driver runs, against the exact
Spark pipeline, across corpora chosen to stress the hash paths:
near-duplicates, short/empty docs, repeated-vocab word salad, and
mixed-case/punctuation text.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from airflow_jira_etl_spark.queries.llm_ops import (
    _mh_oracle,
    _NG_JACCARD_ORACLE,
    minhash_pairs_portable,
    ngram_jaccard_pairs,
)
from airflow_jira_etl_spark.functions.rounding import fround
from pyspark.sql import functions as F

from tests.oracle_check import canon_rows


def _corpora():
    rng = random.Random(1234)
    vocab = [
        "spark", "table", "scan", "join", "group", "filter", "sort",
        "batch", "stream", "value", "key", "row", "column", "fast",
    ]
    salad = []
    for i in range(120):
        n = rng.randint(0, 40)
        salad.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # plant near-dups with distant ids
    dups = []
    for i in range(10):
        base = " ".join(rng.choice(vocab) for _ in range(30))
        # whitespace variant: a doubled space splits into an empty
        # "word", exercising the zero-pad word-hash path on a near-dup
        mutated = base.replace(" ", "  ", 1)
        words = base.split()
        words[rng.randrange(len(words))] = rng.choice(vocab)
        dups.append((1000 + i, base))
        dups.append((2000 + i, " ".join(words)))
        dups.append((3000 + i, mutated))
        dups.append((4000 + i, base))  # exact twin: j = 1.0 guaranteed
    edge = [
        (9001, ""),
        (9002, "x"),
        (9003, "a b"),
        (9004, "Mixed CASE, punct!  double  spaces"),
        (9005, "Mixed CASE, punct!  double  spaces"),
    ]
    # non-ASCII codepoints: DuckDB's INT32 ascii() overflowed the
    # 65599/29791 products before the oracles gained BIGINT casts —
    # this corpus keeps that armor in place (accents + CJK; identical
    # twins must still pair)
    uni = [
        (9101, "café münchen déjà vu résumé naïve"),
        (9102, "café münchen déjà vu résumé naïve"),
        (9103, "日本語 テキスト 処理 テスト 行います"),
        (9104, "日本語 テキスト 処理 テスト 行います"),
        (9105, "mixed ascii und ümlaut wörter hier"),
    ]
    return {
        "word_salad": salad,
        "planted_dups": dups,
        "edges": edge,
        "unicode": uni,
        "all": salad + dups + edge + uni,
    }


def _compare(spark, docs, oracle_sql, spark_fn):
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    duck = con.execute(oracle_sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    out = spark_fn(sdf)
    spark_cols = list(out.columns)
    spark_rows = [tuple(r) for r in out.collect()]

    assert sorted(spark_cols) == sorted(duck_cols)
    assert canon_rows(spark_cols, spark_rows) == canon_rows(
        duck_cols, duck_rows
    ), f"value mismatch on corpus of {len(docs)} docs"
    return len(spark_rows)


@pytest.mark.parametrize("corpus", ["word_salad", "planted_dups", "edges", "unicode", "all"])
def test_minhash_portable_parity_on_generated_corpus(spark, corpus):
    docs = _corpora()[corpus]
    n = _compare(
        spark,
        docs,
        _mh_oracle(),
        lambda df: minhash_pairs_portable(df).select(
            "id1", "id2", fround(F.col("j")).alias("jaccard")
        ),
    )
    if corpus in ("planted_dups", "all"):
        assert n >= 10  # the exact twins (1000+i, 4000+i) must survive
    if corpus == "unicode":
        assert n >= 2  # both unicode identical-twin pairs must pair


@pytest.mark.parametrize("corpus", ["word_salad", "planted_dups", "edges", "unicode", "all"])
def test_ngram_jaccard_parity_on_generated_corpus(spark, corpus):
    docs = _corpora()[corpus]
    n = _compare(spark, docs, _NG_JACCARD_ORACLE, ngram_jaccard_pairs)
    if corpus in ("planted_dups", "all"):
        assert n >= 10
    if corpus == "unicode":
        assert n >= 2
