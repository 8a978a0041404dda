"""Property test for the distributed global ranker: for ANY input —
duplicate sort values, nulls, empty partitions, partition counts above
or below the row count — global_row_number must assign exactly the
permutation 1..n that an un-partitioned window's row_number would,
under the same total (key-tiebroken) ordering.

This operator is load-bearing for two registered queries
(sort_multi_key, win_ntile_percent) and relies on
monotonically_increasing_id's partition-local bit layout; the property
sweep is the guard that the layout assumption and the prefix-sum
offsets compose correctly on adversarial shapes, not just the fixture
distributions."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from airflow_jira_etl_spark.operators.ranking import global_row_number

values = st.lists(
    st.one_of(st.none(), st.integers(-5, 5)), min_size=1, max_size=40
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=values, n_parts=st.integers(1, 8), desc=st.booleans())
def test_global_row_number_is_window_row_number(spark, vals, n_parts, desc):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long")
    v = F.col("v").desc_nulls_first() if desc else F.col("v").asc_nulls_last()
    order = [v, F.col("k")]
    ranked, n = global_row_number(df, order, num_partitions=n_parts)
    assert n == len(vals)
    got = {r.k: r.rn for r in ranked.collect()}
    want = {
        r.k: r.rn
        for r in df.select(
            "k", F.row_number().over(Window.orderBy(*order)).cast("long").alias("rn")
        ).collect()
    }
    assert got == want


values_grouped = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", None]),  # None: NULL group keys
        st.integers(-4, 4),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=values_grouped, n_parts=st.integers(1, 8))
def test_grouped_row_number_matches_partitioned_window(spark, rows, n_parts):
    """grouped_row_number must equal Window.partitionBy(g).orderBy(v,k)
    row_number AND carry the exact per-group count, on any mix of group
    skew, duplicate values, NULL group keys (SQL windows group NULLs
    together — a plain equi-join back would silently DROP those rows)
    and partition counts — including groups split across many range
    partitions and partitions holding several groups."""
    from airflow_jira_etl_spark.operators.ranking import grouped_row_number

    data = [(i, g, v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, g string, v long")
    order = [F.col("v"), F.col("k")]
    ranked = grouped_row_number(df, ["g"], order, num_partitions=n_parts)
    got = {r.k: (r.rn, r.n) for r in ranked.collect()}
    w = Window.partitionBy("g").orderBy(*order)
    wp = Window.partitionBy("g")
    want = {
        r.k: (r.rn, r.n)
        for r in df.select(
            "k",
            F.row_number().over(w).cast("long").alias("rn"),
            F.count("*").over(wp).alias("n"),
        ).collect()
    }
    assert got == want


def test_ranking_rejects_colliding_column_names(spark):
    """Input columns named like the helpers or outputs must fail loudly
    (ambiguous references / silent shadowing otherwise)."""
    import pytest

    from airflow_jira_etl_spark.operators.ranking import (
        global_row_number,
        grouped_row_number,
    )

    df = spark.createDataFrame([(1, "a", 2)], "rn long, g string, v long")
    with pytest.raises(ValueError, match="collide"):
        global_row_number(df, [F.col("v")])
    df2 = spark.createDataFrame([(1, "a", 2)], "n long, g string, v long")
    with pytest.raises(ValueError, match="collide"):
        grouped_row_number(df2, ["g"], [F.col("v")])
