"""Cross-engine parity for the embedding operators on a GENERATED
vector table — the same fixture-drift armor the dedup families have
(tests/test_dedup_parity_property.py), for the embeddings side.

Values are multiples of 1/64 so float32 and float64 represent them
exactly — the parity check must compare hash-identical numbers, not
accumulate representation error. The corpus plants a ZERO vector
(exercising the cs = 0.0 zero-norm guard on both engines) and clustered
labels so the nearest-centroid assignment has real structure.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from airflow_jira_etl_spark import registry
from tests.oracle_check import canon_rows

registry.load_all_queries()

DIM = 8


def _vectors():
    rng = random.Random(77)
    rows = []
    vid = 0
    for label in range(4):
        center = [rng.randint(-32, 32) / 64.0 for _ in range(DIM)]
        for _ in range(12):
            v = [
                c + rng.randint(-8, 8) / 64.0  # exact in f32 and f64
                for c in center
            ]
            rows.append((vid, v, label))
            vid += 1
    rows.append((vid, [0.0] * DIM, 0))  # zero vector: cs must be 0.0
    return rows


@pytest.mark.parametrize(
    "name", ["llm_embed_centroids", "llm_embed_knn_assign"]
)
def test_embedding_parity_on_generated_vectors(name, spark):
    rows = _vectors()
    pdf = pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [r[1] for r in rows],
            "label": [r[2] for r in rows],
        }
    )
    con = duckdb.connect()
    con.register("embeddings_pd", pdf)
    # materialize with the fixture's physical types (FLOAT[] embedding)
    con.execute(
        "CREATE VIEW embeddings AS SELECT vec_id, "
        "CAST(embedding AS FLOAT[]) AS embedding, "
        "CAST(label AS INTEGER) AS label FROM embeddings_pd"
    )
    duck = con.execute(registry.ORACLES[name])
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    sdf = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    # run the registered query body against the generated table by
    # substituting it for the catalog's embeddings load
    import airflow_jira_etl_spark.queries.embedding_ops as eo
    from unittest import mock

    with mock.patch.object(
        eo.catalog, "load", lambda spark, sf, t: sdf
    ):
        out = registry.QUERIES[name](spark, "ignored")
        spark_cols = list(out.columns)
        spark_rows = [tuple(r) for r in out.collect()]

    assert sorted(spark_cols) == sorted(duck_cols)
    assert canon_rows(spark_cols, spark_rows) == canon_rows(
        duck_cols, duck_rows
    )
    if name == "llm_embed_knn_assign":
        by_vec = {r[0]: r for r in spark_rows}
        zero_id = rows[-1][0]
        assert by_vec[zero_id][3] == 0.0  # zero vector scores cs = 0.0


def test_knn_assign_rejects_out_of_domain_label(spark):
    """The packed-key decode assumes labels in [0, 10^6); a drifted
    fixture with a negative label must fail LOUDLY, not decode into a
    corrupted assignment."""
    import airflow_jira_etl_spark.queries.embedding_ops as eo
    from unittest import mock

    rows = [(0, [1.0, 0.0], -1), (1, [0.0, 1.0], 2)]
    sdf = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    with mock.patch.object(eo.catalog, "load", lambda spark, sf, t: sdf):
        df = registry.QUERIES["llm_embed_knn_assign"](spark, "ignored")
        with pytest.raises(Exception, match="label out of"):
            df.collect()
