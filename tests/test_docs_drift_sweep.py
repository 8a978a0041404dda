"""Whole-family defense against documents-corpus regeneration: the
driver's fixture generator rewrote the documents table once already
(round 4: a ~30-word-vocabulary word salad that saturated the old LSH
band geometry), and per-query parity armor exists only for the
minhash/ngram families (test_dedup_parity_property).

This sweep swaps documents.parquet for an ADVERSARIAL generated corpus
— unicode (CJK/accents/emoji), empty and 1-char docs, doubled spaces,
punctuation storms, a 10k-char giant, exact twins and near-dups at
distant ids, PII-shaped strings, high-repetition and numbers-only docs,
doc_ids out at the INT32 edge — and re-runs EVERY registered query
whose oracle reads documents, asserting hash-level Spark/DuckDB
agreement for the whole family on text the fixture generator has never
shipped (yet)."""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from airflow_jira_etl_spark import catalog, registry
from tests.oracle_check import compare, duckdb_conn

registry.load_all_queries()

SRC = "/root/testdata/sf0.01"


def _adversarial_docs() -> list[tuple[int, str, str, str]]:
    """(doc_id, text, lang, source) rows; n_chars derived as len(text)."""
    rng = random.Random(20260814)
    vocab = [
        "spark", "table", "scan", "join", "group", "filter", "sort",
        "batch", "stream", "value", "key", "row", "column", "fast",
        "the", "a", "of", "and",  # stopwords the quality oracle counts
    ]
    rows: list[tuple[int, str, str, str]] = []
    for i in range(150):  # base salad, fixture-like
        n = rng.randint(0, 60)
        rows.append(
            (
                i,
                " ".join(rng.choice(vocab) for _ in range(n)),
                rng.choice(["en", "de", "fr"]),
                f"src{i % 5}",
            )
        )
    for i in range(8):  # exact twins + one-word edits at distant ids
        base = " ".join(rng.choice(vocab) for _ in range(40))
        words = base.split()
        words[rng.randrange(len(words))] = rng.choice(vocab)
        rows.append((10_000 + i, base, "en", "dup"))
        rows.append((20_000 + i, base, "en", "dup"))
        rows.append((30_000 + i, " ".join(words), "en", "dup"))
    edge = [
        "",  # empty text
        "x",
        "a b",
        "Mixed CASE, punct!!  double  spaces ... ;; ~~ ##",
        "!!!???...,,,;;;:::///\\\\|||@@@###$$$%%%^^^&&&***((()))",
        "café münchen déjà vu résumé naïve ümlaut wörter",
        "日本語 テキスト 処理 テスト 行います 形態素 解析",
        "emoji 🎉 mixed 🚀 with words 🤖 and more 🎊 symbols",
        "mail me at jane.doe+spam@example.com or call 555-867-5309",
        "SSN-like 123-45-6789 and card-like 4111 1111 1111 1111",
        "repeat repeat repeat repeat repeat repeat repeat repeat",
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        "0 1 2 3 4 5 6 7 8 9 42 1000000 3.14159 -7 1e9",
        "tabs\tand\nnewlines\nembedded\tin one doc",
        " leading and trailing spaces ",
        "word " * 2000,  # ~10k chars: the giant
    ]
    for j, text in enumerate(edge):
        rows.append(
            (2_147_483_000 + j, text, ["en", "xx", "zz"][j % 3], "edge")
        )
    # NULL text — the drift class the round-9 review found half the
    # family silently diverging on (NULL != empty in BOTH engines, but
    # each operator must agree with ITS oracle on which convention the
    # NULL maps to)
    rows.append((2_147_483_900, None, "en", "edge"))
    rows.append((2_147_483_901, None, "xx", "edge"))
    # NULL lang / NULL source (r13): lang is a GROUP key (corpus
    # stats), a JOIN key (stratified-sample rate table — inner joins
    # drop the NULL identically on both engines) and an isin-filter
    # operand (clean pipeline, split) — each convention must agree
    # with its oracle; source rides along for the same reason
    rows.append((2_147_483_902, "null lang words spark table", None, "edge"))
    rows.append((2_147_483_903, "null source words scan join", "en", None))
    rows.append((2_147_483_904, None, None, None))
    # NULL doc_id (r14): doc_id is a GROUP key (per-doc aggregates keep
    # the NULL group on both engines), an equi-JOIN key (dropped on
    # both), a `% 97` filter operand (NULL comparison drops the row on
    # both sides of the eval/train split), a hash-priority input
    # (NULL priority → asc_nulls_last, the repo's DuckDB null-order
    # convention), and an argmin-encoding input (paragraph dedup's
    # runtime guard must NOT trip: NULL propagates through the range
    # check as NULL → WHEN condition not true... which would take the
    # raise branch, so the operator filters NULL doc_id like NULL text)
    rows.append((None, "null id words join hash batch", "en", "edge"))
    rows.append((None, "join hash", "de", "edge"))
    rows.append((None, None, None, None))
    return rows


@pytest.fixture(scope="module")
def docs_fixture(tmp_path_factory):
    """sf0.01 with documents replaced by the adversarial corpus; every
    other table symlinked unchanged."""
    tmp = str(tmp_path_factory.mktemp("docsdrift"))
    for t in catalog.TABLES:
        p = catalog.table_path(SRC, t)
        os.symlink(p, os.path.join(tmp, os.path.basename(p)))
    rows = _adversarial_docs()
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array(
                [len(r[1]) if r[1] is not None else None for r in rows],
                pa.int64(),
            ),
        }
    )
    os.remove(os.path.join(tmp, "documents.parquet"))
    pq.write_table(
        table, os.path.join(tmp, "documents.parquet"), store_schema=False
    )
    return tmp


def test_all_documents_oracles_survive_corpus_drift(spark, docs_fixture):
    """One sweep, all failures reported together: every
    documents-reading oracle must hash-match on the generated corpus."""
    con = duckdb_conn(docs_fixture)
    failures = {}
    names = sorted(
        n for n, sql in registry.ORACLES.items() if "documents" in sql.lower()
    )
    for name in names:
        try:
            r = compare(
                registry.QUERIES[name](spark, docs_fixture),
                con,
                registry.ORACLES[name],
            )
            if r["errors"]:
                failures[name] = r["errors"][:2]
        except Exception as exc:  # noqa: BLE001 — collect, report below
            failures[name] = [f"raised: {exc!r:.200}"]
    assert not failures, (
        f"{len(failures)} documents oracle(s) diverge on the adversarial "
        f"generated corpus: {failures}"
    )
