"""Shared helper: materialize a scale-factor directory whose documents
table is a synthetic corpus (every other table symlinked from sf0.01),
so per-operator tests can drive registered (spark, sf_dir) queries —
and their DuckDB oracles — on targeted document sets. Same table
construction as tests/test_docs_drift_sweep.py."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from airflow_jira_etl_spark import catalog

SRC = "/root/testdata/sf0.01"


def write_docs_fixture(
    tmp: str, rows: list[tuple[int | None, str | None, str | None, str | None]]
) -> str:
    """rows = (doc_id, text, lang, source); n_chars derived from text."""
    for t in catalog.TABLES:
        p = catalog.table_path(SRC, t)
        dst = os.path.join(tmp, os.path.basename(p))
        if not os.path.exists(dst):
            os.symlink(p, dst)
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
    doc_path = os.path.join(tmp, "documents.parquet")
    if os.path.lexists(doc_path):
        os.remove(doc_path)
    pq.write_table(table, doc_path, store_schema=False)
    return tmp
