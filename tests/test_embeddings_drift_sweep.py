"""Whole-family defense against embeddings-fixture regeneration —
the same parquet-level sweep the events (test_ns_drift_sweep) and
documents (test_docs_drift_sweep) tables have.

The generated table drifts every axis a regeneration could move:
DIMENSION 32 instead of the shipped 64 (the hyperplane bucket reads
components 1..24 — it must keep working, identically on both engines,
when the tail components disappear), a planted ZERO vector (zero-norm
cosine guard), exact duplicates at distant ids, negative-heavy
vectors, a large-magnitude vector, and clustered labels. All values
are multiples of 1/64 so float32 and float64 represent them exactly —
hash-level comparison must see identical numbers, not representation
error."""

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
DIM = 32


def _adversarial_vectors() -> list[tuple[int, list[float], int]]:
    rng = random.Random(8814)
    rows: list[tuple[int, list[float], int]] = []
    vid = 0
    for label in range(10):
        center = [rng.randint(-32, 32) / 64.0 for _ in range(DIM)]
        for _ in range(40):
            v = [c + rng.randint(-8, 8) / 64.0 for c in center]
            rows.append((vid, v, label))
            vid += 1
    # exact duplicates at distant ids (sim == 1.0 pairs)
    for j in range(5):
        rows.append((100_000 + j, list(rows[j][1]), rows[j][2]))
    rows.append((200_000, [0.0] * DIM, 0))  # zero vector: cs guard
    rows.append((200_001, [-1.0] * DIM, 1))  # all-negative
    rows.append((200_002, [512.0] * DIM, 2))  # large magnitude, exact
    # NULL embedding: cosine must stay NULL (not coalesce to 0.0), the
    # knn assignment must be NULL (no nearest centroid exists), and the
    # LSH sign bits must read 0 — all verified against the oracles
    rows.append((200_003, None, 3))
    # a NULL ELEMENT: raw list_cosine_similarity hard-errors on it
    # ('can not contain NULL values') — the cosine_sql guard ladder
    # must score it NULL on both engines instead of crashing the
    # oracle mid-sweep (round 11)
    corrupt = [1.0 / 64.0] * DIM
    corrupt[7] = None  # type: ignore[call-overload]
    rows.append((200_004, corrupt, 4))
    return rows


@pytest.fixture(scope="module")
def emb_fixture(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("embdrift"))
    for t in catalog.TABLES:
        p = catalog.table_path(SRC, t)
        os.symlink(p, os.path.join(tmp, os.path.basename(p)))
    rows = _adversarial_vectors()
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    os.remove(os.path.join(tmp, "embeddings.parquet"))
    pq.write_table(
        table, os.path.join(tmp, "embeddings.parquet"), store_schema=False
    )
    return tmp


def test_all_embeddings_oracles_survive_vector_drift(spark, emb_fixture):
    con = duckdb_conn(emb_fixture)
    failures = {}
    names = sorted(
        n
        for n, sql in registry.ORACLES.items()
        if "embeddings" in sql.lower()
    )
    assert len(names) >= 5  # topk, pairs, lsh_topk, sem_clusters, centroids, knn
    for name in names:
        try:
            r = compare(
                registry.QUERIES[name](spark, emb_fixture),
                con,
                registry.ORACLES[name],
            )
            if r["errors"]:
                failures[name] = r["errors"][:2]
        except Exception as exc:  # noqa: BLE001 — collect, report below
            failures[name] = [f"raised: {exc!r:.200}"]
    assert not failures, (
        f"{len(failures)} embeddings oracle(s) diverge on the generated "
        f"dim-{DIM} vector table: {failures}"
    )
