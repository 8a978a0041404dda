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


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=values_grouped, n_parts=st.integers(1, 8))
def test_grouped_rank_select_matches_window_quantiles(spark, rows, n_parts):
    """grouped_rank_select must pick EXACTLY the rows a partitioned
    window's row_number would select at the lower-quantile ranks
    (p25/p50/p75), and carry the exact group count — on any mix of
    group skew, duplicate values, NULL group keys, and partition counts
    that split one group across many range partitions. The driver-side
    rank→(partition, local index) resolution is the part under test:
    an off-by-one against the prefix-sum offsets would pick a
    neighboring row, which duplicate-heavy inputs expose only when the
    neighbor differs."""
    from airflow_jira_etl_spark.operators.ranking import grouped_rank_select

    data = [(i, g, v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, g string, v long")
    order = [F.col("v"), F.col("k")]
    ranks = {
        "p25": lambda n: (n + 3) // 4,
        "p50": lambda n: (n + 1) // 2,
        "p75": lambda n: (3 * n + 1) // 4,
    }
    sel = grouped_rank_select(df, ["g"], order, ranks, num_partitions=n_parts)
    got = {
        r.g: (r.n, r.p25.v, r.p50.v, r.p75.v) for r in sel.collect()
    }
    w = Window.partitionBy("g").orderBy(*order)
    wp = Window.partitionBy("g")
    ranked = df.select(
        "g", "v",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("n"),
    )
    want = {}
    for r in ranked.collect():
        n = r.n
        cur = want.setdefault(r.g, [n, None, None, None])
        for slot, fn in enumerate(ranks.values(), start=1):
            if r.rn == fn(n):
                cur[slot] = r.v
    assert got == {g: tuple(vals) for g, vals in want.items()}


def test_grouped_rank_select_rejects_out_of_range_rank(spark):
    """A rank resolving outside [1, n] must raise, not emit NULL — a
    silent NULL is indistinguishable from data loss."""
    import pytest

    from airflow_jira_etl_spark.operators.ranking import grouped_rank_select

    df = spark.createDataFrame([(1, "a", 10)], "k long, g string, v long")
    with pytest.raises(ValueError, match="out of"):
        grouped_rank_select(
            df, ["g"], [F.col("v"), F.col("k")], {"bad": lambda n: n + 1}
        ).collect()


def test_grouped_rank_select_every_rank_across_partition_boundaries(spark):
    """Adversarial sweep of the driver-side rank→(partition, local
    index) resolution: select EVERY rank 1..n of a single group forced
    across many range partitions. Because every rank is selected, every
    partition's FIRST row (r = off + 1 → idx = first) and LAST row
    (r = off + cnt → idx = first + cnt - 1) is among the targets — the
    exact coordinates where an off-by-one in the exclusive-prefix
    arithmetic would select a neighboring partition's row or miss. The
    ordering is duplicate-heavy on v (ties straddle boundaries) with a
    unique k tiebreak, per the operator's total-order contract."""
    from airflow_jira_etl_spark.operators.ranking import grouped_rank_select

    n = 60
    n_parts = 8
    # v has only 5 distinct values → long tie runs crossing boundaries
    data = [(k, "a", k % 5) for k in range(n)]
    df = spark.createDataFrame(data, "k long, g string, v long")
    order = [F.col("v"), F.col("k")]
    # premise check: the group really does span >= 3 range partitions
    # under this (data, n_parts) — otherwise the boundary sweep is void
    spanned = (
        df.repartitionByRange(n_parts, F.col("g"), *order)
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert spanned >= 3, f"premise: group spans {spanned} partitions"
    ranks = {f"r{i:02d}": (lambda i: lambda _n: i)(i) for i in range(1, n + 1)}
    sel = grouped_rank_select(df, ["g"], order, ranks, num_partitions=n_parts)
    row = sel.collect()
    assert len(row) == 1 and row[0]["n"] == n
    got = [row[0][f"r{i:02d}"]["k"] for i in range(1, n + 1)]
    want = [
        r.k
        for r in df.select(
            "k", F.row_number().over(Window.partitionBy("g").orderBy(*order)).alias("rn")
        )
        .orderBy("rn")
        .collect()
    ]
    assert got == want


def test_grouped_rank_select_coincident_ranks_and_tiny_groups(spark):
    """Several labels resolving to the SAME (partition, index)
    coordinate (p25 = p50 = p75 = 1 on a 1-row group) must each get the
    row — the selection join duplicates the matched row per label and
    the pivot routes one copy to each column. Mixed with a larger group
    so the same pivot handles distinct and coincident targets at once."""
    from airflow_jira_etl_spark.operators.ranking import grouped_rank_select

    data = [(0, "solo", 7)] + [(k, "duo", 10 + k) for k in (1, 2)] + [
        (k, "big", 100 - k) for k in range(3, 12)
    ]
    df = spark.createDataFrame(data, "k long, g string, v long")
    ranks = {
        "p25": lambda n: (n + 3) // 4,
        "p50": lambda n: (n + 1) // 2,
        "p75": lambda n: (3 * n + 1) // 4,
    }
    sel = grouped_rank_select(
        df, ["g"], [F.col("v"), F.col("k")], ranks, num_partitions=5
    )
    got = {r.g: (r.n, r.p25.k, r.p50.k, r.p75.k) for r in sel.collect()}
    # solo: all three ranks are 1 → the single row three times
    assert got["solo"] == (1, 0, 0, 0)
    # duo: p25=p50=p75=1 under the lower-quantile convention
    # ((3*2+1)//4 = 1) — a 2-row group still lands all labels on row 1
    assert got["duo"] == (2, 1, 1, 1)
    # big (v descending by k): n=9 → ranks 3, 5, 7 over v ascending
    big_sorted = sorted(range(3, 12), key=lambda k: 100 - k)
    assert got["big"] == (9, big_sorted[2], big_sorted[4], big_sorted[6])


def test_ranking_survives_cache_drop_between_passes(spark):
    """Round-11 regression: the range-tagged frame must be
    lineage-truncated (localCheckpoint), not merely persisted. A
    re-executed repartitionByRange re-SAMPLES its boundaries (the
    sampler's seeds incorporate the per-execution RDD id), so with a
    plain persist a clearCache() between the operator call and the
    caller's action recomputed the output pass under a DIFFERENT
    partitioning than the bookkeeping pass measured — reproducibly
    yielding NULL rank cells and wrong ranks. With lineage truncation
    the one materialized layout serves both passes and clearCache is
    irrelevant to it; this test drops the SQL cache mid-operator and
    requires exact agreement with the window oracle."""
    from airflow_jira_etl_spark.operators.ranking import (
        grouped_rank_select,
        grouped_row_number,
    )

    df = spark.range(20000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("string").alias("g"),
        (F.col("id") % 13).alias("v"),
    )
    order = [F.col("v"), F.col("k")]
    ranks = {"p50": lambda n: (n + 1) // 2}
    sel = grouped_rank_select(df, ["g"], order, ranks, num_partitions=16)
    spark.catalog.clearCache()  # between the passes, before the action
    got = {r.g: (r.n, r.p50.k) for r in sel.collect()}
    w = Window.partitionBy("g").orderBy(*order)
    wp = Window.partitionBy("g")
    want = {}
    for r in df.select(
        "g", "k",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("n"),
    ).collect():
        if r.rn == (r.n + 1) // 2:
            want[r.g] = (r.n, r.k)
    assert got == want

    rn = grouped_row_number(df, ["g"], order, num_partitions=16)
    spark.catalog.clearCache()
    got_rn = {r.k: r.rn for r in rn.collect()}
    want_rn = {
        r.k: r.rn
        for r in df.select(
            "k", F.row_number().over(w).cast("long").alias("rn")
        ).collect()
    }
    assert got_rn == want_rn


def test_running_sum_and_global_rn_survive_cache_drop(spark):
    """Completes the round-11 cache-drop matrix over the _range_tag
    family: grouped_running_sum and global_row_number must also hold
    exact window-oracle agreement when the SQL cache is dropped between
    the operator call and the caller's action — all four operators
    share _range_tag's localCheckpoint, but each consumes the tagged
    frame through different bookkeeping (prefix SUMS vs counts vs
    coordinate selection), so each deserves its own pin against a
    future refactor reintroducing a recomputable materialization."""
    from airflow_jira_etl_spark.operators.ranking import (
        global_row_number,
        grouped_running_sum,
    )

    df = spark.range(20000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("string").alias("g"),
        (F.col("id") % 13).alias("v"),
        F.when(F.col("id") % 11 == 0, None)
        .otherwise(F.col("id") % 5)
        .alias("x"),  # NULL summands: exercise the null-aware offsets
    )
    order = [F.col("v"), F.col("k")]
    w = Window.partitionBy("g").orderBy(*order)

    rs = grouped_running_sum(
        df, ["g"], order, F.col("x"), num_partitions=16
    )
    spark.catalog.clearCache()  # between the passes, before the action
    got = {r.k: r.rsum for r in rs.collect()}
    want = {
        r.k: r.rsum
        for r in df.select(
            "k",
            F.sum("x")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("rsum"),
        ).collect()
    }
    assert got == want

    ranked, n = global_row_number(df, order + [F.col("g")], num_partitions=16)
    spark.catalog.clearCache()
    got_rn = {r.k: r.rn for r in ranked.collect()}
    assert n == 20000
    wg = Window.orderBy(*(order + [F.col("g")]))
    want_rn = {
        r.k: r.rn
        for r in df.select(
            "k", F.row_number().over(wg).cast("long").alias("rn")
        ).collect()
    }
    assert got_rn == want_rn


def test_grouped_rank_select_empty_ranks_rejected(spark):
    """ranks={} must raise, not return an empty frame — an empty
    selection result would be indistinguishable from an input with no
    groups (and would silently drop the documented n_col row too)."""
    import pytest

    from airflow_jira_etl_spark.operators.ranking import grouped_rank_select

    df = spark.createDataFrame([(1, "a", 10)], "k long, g string, v long")
    with pytest.raises(ValueError, match="non-empty"):
        grouped_rank_select(df, ["g"], [F.col("v"), F.col("k")], {})


def test_grouped_rank_select_group_absent_after_filter(spark):
    """A group emptied by an upstream filter must simply not appear in
    the output (no bookkeeping row → no rank resolution → no crash);
    surviving groups keep exact coordinates even when the filter
    perforates their partition-local index space (min-idx per slice is
    re-measured AFTER the filter, not inherited)."""
    from airflow_jira_etl_spark.operators.ranking import grouped_rank_select

    data = [(k, "dead" if k % 2 else "live", k) for k in range(40)]
    df = spark.createDataFrame(data, "k long, g string, v long").filter(
        F.col("g") != "dead"
    )
    sel = grouped_rank_select(
        df,
        ["g"],
        [F.col("v"), F.col("k")],
        {"p50": lambda n: (n + 1) // 2},
        num_partitions=6,
    )
    rows = sel.collect()
    assert {r.g for r in rows} == {"live"}
    (r,) = rows
    live_keys = sorted(k for k in range(40) if k % 2 == 0)
    assert r.n == len(live_keys)
    assert r.p50.k == live_keys[(len(live_keys) + 1) // 2 - 1]


rsum_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", None]),  # None: NULL group keys
        st.integers(-4, 4),  # order key with heavy ties
        st.one_of(st.none(), st.integers(-5, 5)),  # NULL summands
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rsum_rows, n_parts=st.integers(1, 8), with_total=st.booleans())
def test_grouped_running_sum_matches_partitioned_window(
    spark, rows, n_parts, with_total
):
    """grouped_running_sum under a UNIQUE total order (key tiebreak)
    must equal the ROWS-frame Window.partitionBy(g).orderBy(v,k) sum on
    any mix of group skew, NULL group keys, NULL summands (all-NULL
    prefix stays NULL — the offset/local split must not coalesce it to
    0), negative values, and partition counts that split one group
    across many range partitions."""
    from airflow_jira_etl_spark.operators.ranking import grouped_running_sum

    data = [(i, g, v, x) for i, (g, v, x) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, g string, v long, x long")
    order = [F.col("v"), F.col("k")]
    total = "gtot" if with_total else None
    got_df = grouped_running_sum(
        df, ["g"], order, F.col("x"), total_col=total, num_partitions=n_parts
    )
    got = {
        r.k: (r.rsum, r.gtot if with_total else None)
        for r in got_df.collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("g")
    want = {
        r.k: (r.rsum, r.gtot if with_total else None)
        for r in df.select(
            "k",
            F.sum("x").over(w).alias("rsum"),
            F.sum("x").over(wp).alias("gtot"),
        ).collect()
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 3)),
        min_size=1,
        max_size=40,
    ),
    n_parts=st.integers(1, 8),
)
def test_grouped_running_sum_tie_invariant_aggregates(spark, rows, n_parts):
    """The sweep-line consumption pattern: a NON-unique order whose ties
    carry equal summands (+1 for every row tied on (g, v) here via
    delta = v % 2). Per-row values may differ from the window's under
    tie reshuffling across range-partition boundaries, but the
    per-group (max, min, count) of the running sum — what the
    concurrency sweep consumes — must be identical."""
    from airflow_jira_etl_spark.operators.ranking import grouped_running_sum

    data = [(g, v, 1 if v % 2 else -1) for g, v in rows]
    df = spark.createDataFrame(data, "g string, v long, delta long")
    # ties on the FULL ordering (g, v, delta) share the same delta by
    # construction, so the prefix-sum multiset is linearization-proof
    order = [F.col("v"), F.col("delta")]
    got_df = grouped_running_sum(
        df, ["g"], order, F.col("delta"), num_partitions=n_parts
    )
    agg = lambda frame: {
        r.g: (r.mx, r.mn, r.c)
        for r in frame.groupBy("g")
        .agg(
            F.max("rsum").alias("mx"),
            F.min("rsum").alias("mn"),
            F.count("*").alias("c"),
        )
        .collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy("v", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want_df = df.select("g", F.sum("delta").over(w).alias("rsum"))
    assert agg(got_df) == agg(want_df)


def test_grouped_running_sum_global_form(spark):
    """Empty group list degenerates to a GLOBAL running sum (one
    implicit group): matches the un-partitioned window form."""
    from airflow_jira_etl_spark.operators.ranking import grouped_running_sum

    data = [(i, (i * 7) % 5, i - 3) for i in range(23)]
    df = spark.createDataFrame(data, "k long, v long, x long")
    order = [F.col("v"), F.col("k")]
    got = {
        r.k: (r.rsum, r.tot)
        for r in grouped_running_sum(
            df, [], order, F.col("x"), total_col="tot", num_partitions=4
        ).collect()
    }
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r.k: (r.rsum, r.tot)
        for r in df.select(
            "k",
            F.sum("x").over(w).alias("rsum"),
            F.sum("x").over(Window.partitionBy()).alias("tot"),
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
        grouped_running_sum,
    )

    df = spark.createDataFrame([(1, "a", 2)], "rn long, g string, v long")
    with pytest.raises(ValueError, match="collide"):
        global_row_number(df, [F.col("v")])
    df2 = spark.createDataFrame([(1, "a", 2)], "n long, g string, v long")
    with pytest.raises(ValueError, match="collide"):
        grouped_row_number(df2, ["g"], [F.col("v")])
    df3 = spark.createDataFrame([(1, "a", 2)], "rsum long, g string, v long")
    with pytest.raises(ValueError, match="collide"):
        grouped_running_sum(df3, ["g"], [F.col("v")], F.col("v"))
    ok = spark.createDataFrame([(1, "a", 2)], "k long, g string, v long")
    # a helper-named OUTPUT would be eaten by the final helper drop
    with pytest.raises(ValueError, match="reserved"):
        grouped_running_sum(ok, ["g"], [F.col("v")], F.col("v"), sum_col="_gr_lsum")
    with pytest.raises(ValueError, match="distinct"):
        grouped_running_sum(
            ok, ["g"], [F.col("v")], F.col("v"), sum_col="s", total_col="s"
        )
    from airflow_jira_etl_spark.operators.ranking import grouped_rank_select

    # a rank LABEL colliding with an input column would shadow it in
    # the pivoted output; n_col duplicating a label breaks distinctness
    with pytest.raises(ValueError, match="collide"):
        grouped_rank_select(ok, ["g"], [F.col("v")], {"v": lambda n: 1})
    with pytest.raises(ValueError, match="distinct"):
        grouped_rank_select(
            ok, ["g"], [F.col("v")], {"p50": lambda n: 1}, n_col="p50"
        )


def test_grouped_forms_handle_nan_group_keys(spark):
    """NaN group keys: Spark's groupBy/range-sort/eqNullSafe all treat
    NaN as ONE group, but NaN != NaN makes a plain Python dict lookup
    miss — without sentinel normalization the driver-side prefix would
    silently restart at every range-partition boundary. Forcing many
    partitions over a NaN-heavy group makes the group span partitions."""
    from airflow_jira_etl_spark.operators.ranking import (
        grouped_row_number,
        grouped_running_sum,
    )

    nan = float("nan")
    data = [(i, nan if i % 3 else 1.5, 1) for i in range(30)]
    df = spark.createDataFrame(data, "k long, g double, x long")
    ranked = grouped_row_number(
        df, ["g"], [F.col("k")], num_partitions=7
    )
    got = {r.k: (r.rn, r.n) for r in ranked.collect()}
    w = Window.partitionBy("g").orderBy("k")
    want = {
        r.k: (r.rn, r.n)
        for r in df.select(
            "k",
            F.row_number().over(w).cast("long").alias("rn"),
            F.count("*").over(Window.partitionBy("g")).alias("n"),
        ).collect()
    }
    assert got == want
    summed = grouped_running_sum(
        df, ["g"], [F.col("k")], F.col("x"), total_col="t", num_partitions=7
    )
    got_s = {r.k: (r.rsum, r.t) for r in summed.collect()}
    ws = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want_s = {
        r.k: (r.rsum, r.t)
        for r in df.select(
            "k",
            F.sum("x").over(ws).alias("rsum"),
            F.sum("x").over(Window.partitionBy("g")).alias("t"),
        ).collect()
    }
    assert got_s == want_s
    # rank selection: the driver's _group_key sentinel must also keep
    # the NaN group's slices accumulated as ONE group, and the raw-NaN
    # n_df join back must match via eqNullSafe (NaN <=> NaN is true)
    from airflow_jira_etl_spark.operators.ranking import grouped_rank_select

    sel = grouped_rank_select(
        df,
        ["g"],
        [F.col("k")],
        {"p50": lambda n: (n + 1) // 2},
        num_partitions=7,
    )
    got_q = {
        ("nan" if r.g != r.g else r.g): (r.n, r.p50.k) for r in sel.collect()
    }
    want_q = {}
    for r in df.select(
        "g", "k",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("g")).alias("n"),
    ).collect():
        if r.rn == (r.n + 1) // 2:
            want_q[("nan" if r.g != r.g else r.g)] = (r.n, r.k)
    assert got_q == want_q


def test_ivf_scale_probe_smoke(spark, sf_dir):
    """The IVF scale probe (tools/ivf_scale_probe) must run end-to-end
    at sf0.001 — it is the evidence artifact behind the PLANS.md claim
    that warm search cost tracks the probed directories, not the
    corpus."""
    from airflow_jira_etl_spark.tools.ivf_scale_probe import main

    assert main(["ivf_scale_probe", sf_dir, "1"]) == 0


def test_rsum_scale_probe_smoke(spark, sf_dir):
    """The running-sum scale probe (tools/rsum_scale_probe) must run
    end-to-end at sf0.001 on BOTH axes — points-per-day multiples and
    the round-11 growing-|days| axis: the two forms (registered window
    shape vs grouped_running_sum) are equality-asserted per multiple
    inside main(), so a green exit IS the at-scale equivalence check
    (including that the hash-assigned day-block shift preserves
    per-day semantics)."""
    from airflow_jira_etl_spark.tools.rsum_scale_probe import main

    assert main(["rsum_scale_probe", sf_dir, "1,2", "1,3"]) == 0


def test_concurrency_sweep_rehearsal_on_running_sum(spark, sf_dir):
    """Cross-check for the r10 swap: win_concurrency_sweep is now
    REGISTERED on grouped_running_sum (the distributed form that
    removed the |days|-cardinality window partition — adopted after
    the r08/r09 pinned driver rows confirmed green twice). This test
    keeps the ORIGINAL ``PARTITION BY day_idx`` window formulation as
    the independent reference plan and asserts exact output equality
    on the real events fixture, so any drift between the two-phase
    prefix sum and plain window semantics fails here first."""
    from pyspark.sql import Window

    from airflow_jira_etl_spark import catalog
    from airflow_jira_etl_spark.queries.windows import (
        concurrency_points,
        win_concurrency_sweep,
    )

    events = catalog.load(spark, sf_dir, "events")
    pts = concurrency_points(events)
    # the pre-swap registered plan: per-day window running sum
    w = (
        Window.partitionBy("day_idx")
        .orderBy("pt_us", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select(
        "day_idx", "pt_us", F.sum("delta").over(w).alias("live")
    )
    got = run.groupBy("day_idx").agg(
        F.max("live").alias("max_concurrent"),
        F.count(F.lit(1)).alias("n_points"),
        F.min("pt_us").alias("min_pt_us"),
        F.max("pt_us").alias("max_pt_us"),
    ).select(
        F.date_add(
            F.to_date(F.lit("1970-01-01")), F.col("day_idx").cast("int")
        ).alias("day"),
        "max_concurrent",
        "n_points",
        "min_pt_us",
        "max_pt_us",
    )
    want = win_concurrency_sweep(spark, sf_dir)
    key = lambda r: str(r["day"])
    got_rows = {key(r): tuple(r) for r in got.collect()}
    want_rows = {key(r): tuple(r) for r in want.collect()}
    assert got_rows == want_rows and len(got_rows) > 0
