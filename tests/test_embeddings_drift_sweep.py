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
    # a NaN ELEMENT: unguarded, Spark's fold propagates NaN while
    # DuckDB's list_sum yields NULL — the round-12 divergence the
    # ladder's NaN rung closes (both engines now score it NULL, the
    # same corrupt class as a NULL element)
    nanv = [1.0 / 64.0] * DIM
    nanv[3] = float("nan")
    rows.append((200_005, nanv, 5))
    # NULL vec_id (r14, mirroring the docs corpus's NULL doc_id axis):
    # vec_id is a JOIN key (pair queries drop it on both engines), a
    # components seed (dedup_clusters filters NULL ids — the r14
    # NULL-key convention, matched by the oracles' lbl seeds), an
    # ordering tie-break (top-k rank chains end on vec_id — NULLS
    # LAST convention), and a GROUP key. One healthy vector and one
    # NULL-embedding row carry it so both code paths see the axis.
    rows.append((None, [1.0 / 64.0] * DIM, 6))
    rows.append((None, None, 7))
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


def test_cosine_ladder_parity_on_mixed_corrupt_chunks(spark):
    """The guard-ladder contract (functions/similarity.py) attacked at
    the DuckDB VECTOR-SIZE boundary: the cosine_sql docstring's claim —
    eager branch evaluation over a chunk is harmless because the ELSE
    is throw-free — was verified on sub-chunk fixtures; DuckDB
    vectorizes in 2048-row chunks, so a >2048-row table with corrupt
    rows scattered across EVERY chunk is the shape that would expose a
    per-chunk behavior change (one corrupt row poisoning its whole
    chunk, or a guard decided per-chunk instead of per-row).

    5000 rows, five corrupt shapes interleaved by id stride so each
    2048-row chunk carries all of them: NULL vector, NULL element,
    length mismatch, zero vector, and an empty-empty pair. Expected
    class is asserted row-by-row AND values must match Spark's ladder
    decision-for-decision."""
    import duckdb
    import pandas as pd

    from airflow_jira_etl_spark.functions.similarity import (
        cosine,
        cosine_sql,
    )

    dim = 8
    rng = random.Random(4242)

    def clean():
        return [rng.randint(-32, 32) / 64.0 for _ in range(dim)]

    rows = []
    for i in range(5000):
        a, b, kind = clean(), clean(), "clean"
        if i % 97 == 3:
            a, kind = None, "null_vec"
        elif i % 89 == 5:
            b = clean()
            b[i % dim] = None
            kind = "null_el"
        elif i % 83 == 7:
            a, kind = clean()[: dim - 2], "len_mismatch"
        elif i % 79 == 11:
            b, kind = [0.0] * dim, "zero_norm"
        elif i % 73 == 13:
            a, b, kind = [], [], "empty_pair"
        elif i % 71 == 17:
            a = clean()
            a[i % dim] = float("nan")
            kind = "nan_el"  # corrupt: NULL on both engines (r12 rung)
        elif i % 67 == 19:
            b = clean()
            b[i % dim] = float("inf")
            kind = "inf_el"  # NOT guarded: both engines propagate to
            # NaN identically; the contract is agreement, not a class
        rows.append((i, a, b, kind))
    kinds = {r[3] for r in rows}
    assert kinds == {
        "clean", "null_vec", "null_el", "len_mismatch", "zero_norm",
        "empty_pair", "nan_el", "inf_el",
    }
    # every 2048-row duckdb chunk must carry corrupt rows
    for lo in range(0, 5000, 2048):
        assert any(r[3] != "clean" for r in rows[lo : lo + 2048])

    con = duckdb.connect()
    con.register(
        "pairs_pd",
        pd.DataFrame(
            {
                "id": [r[0] for r in rows],
                "a": [r[1] for r in rows],
                "b": [r[2] for r in rows],
            }
        ),
    )
    con.execute(
        "CREATE VIEW pairs AS SELECT id, CAST(a AS FLOAT[]) a, "
        "CAST(b AS FLOAT[]) b FROM pairs_pd"
    )
    duck = dict(
        con.execute(
            f"SELECT id, round(CAST({cosine_sql('a', 'b')} AS DOUBLE), 7)"
            f" FROM pairs"
        ).fetchall()
    )

    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in rows],
        "id long, a array<float>, b array<float>",
    )
    got = {
        r.id: r.cs
        for r in sdf.select(
            "id", F.round(cosine(F.col("a"), F.col("b")), 7).alias("cs")
        ).collect()
    }

    by_kind = {r[0]: r[3] for r in rows}
    mismatches = []
    for i, kind in by_kind.items():
        s, d = got[i], duck[i]
        if kind in ("null_vec", "null_el", "len_mismatch", "nan_el"):
            ok = s is None and d is None
        elif kind in ("zero_norm", "empty_pair"):
            ok = s == 0.0 and d == 0.0
        elif kind == "inf_el":
            # inf·finite → NaN on BOTH engines; the comparator
            # canonicalizes NaN stably, so agreement is the contract
            ok = s is not None and d is not None and s != s and d != d
        else:
            ok = s is not None and d is not None and s == d
        if not ok:
            mismatches.append((i, kind, s, d))
    assert not mismatches, f"{len(mismatches)} diverge: {mismatches[:5]}"


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
