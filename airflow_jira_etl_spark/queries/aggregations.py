"""Aggregations — SURVEY.md §2B "Aggregations".

The canonical shape is the reference's raison-d'être rollup: "billable
seconds by author/day" (worklog measures at
``/root/reference/dags/fetch_jira_tempo_worklogs.py:84-86``) — here as
TPC-H-Q1-style multi-measure group-bys over lineitem/orders/events.

Scale notes: every groupBy below is a hash aggregate with map-side
partial aggregation, so only |groups| rows cross the shuffle — the
plan shape is identical at sf0.001 and 100 TB. ``count distinct`` is
the exception (needs the raw keys per group); the approximate variant
(HLL++) is the 100 TB path and is bounded against exact in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.functions.rounding import fround
from airflow_jira_etl_spark.registry import query


@query(
    "agg_group_sum",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           round(sum(l_extendedprice) + 1e-9, 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4) AS sum_disc_price,
           round(avg(l_quantity) + 1e-9, 4) AS avg_qty,
           round(avg(l_extendedprice) + 1e-9, 4) AS avg_price,
           round(avg(l_discount) + 1e-9, 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style multi-measure group-by — sums, averages and counts
    by the two status flags."""
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            # fround like every other float aggregate here: group sums
            # at ~4e9 have measured summation-order spread past the
            # compare harness's 4-dp margin (sum_qty sums integral
            # doubles exactly and needs no rounding)
            fround(F.sum("l_extendedprice")).alias("sum_base_price"),
            fround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("sum_disc_price"),
            fround(F.avg("l_quantity")).alias("avg_qty"),
            fround(F.avg("l_extendedprice")).alias("avg_price"),
            fround(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (expand + two-phase aggregate)."""
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "agg_approx_distinct",
    # Boolean-contract oracle: the HLL++ ESTIMATE is engine-specific
    # (never hashable cross-engine), so the hashed surface is the exact
    # per-group count plus the CLAIM that the estimate lands within the
    # ±5% tolerance (5× the configured rsd — a ~5-sigma margin, so the
    # claim cannot flake on a regenerated fixture) — Spark computes both
    # estimate and exact and asserts the bound; the oracle recomputes
    # the exact count and expects the claim to hold.
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HLL++) — the 100 TB path for
    cardinality: constant memory per group vs the exact expand. The
    estimate itself differs across engines by design, so the
    differential surface is a boolean contract (estimate within ±5% of
    exact, both computed in the same Spark pass); tests/test_operators
    additionally bounds the raw estimate."""
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    ).select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.05 * F.col("exact_parts")
        ).alias("within_tol"),
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           round(sum(o_totalprice) + 1e-9, 4) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) > 8
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    orders = catalog.load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            fround(F.sum("o_totalprice")).alias("total_spend"),
        )
        .where(F.col("n_orders") > 8)
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name,
           round(sum(c_acctbal) + 1e-9, 4) AS total_bal,
           count(*) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total)."""
    customer = catalog.load(spark, sf_dir, "customer")
    nation = catalog.load(spark, sf_dir, "nation")
    region = catalog.load(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        fround(F.sum("c_acctbal")).alias("total_bal"),
        F.count("*").alias("n_cust"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice) + 1e-9, 4) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping combinations)."""
    orders = catalog.load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        fround(F.sum("o_totalprice")).alias("total_price"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INTEGER)
             AS grp_id,
           sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets + grouping id (which-set marker)."""
    catalog.load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT)
                 AS grp_id,
               sum(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        """
    )


@query(
    "agg_stats",
    # non-finite guard rung (round 12, the cosine-ladder pattern): a
    # NaN/±Inf value in a group makes sd/var/median NULL on BOTH
    # engines — unguarded, DuckDB's STDDEV_SAMP/VAR_SAMP HARD-ERROR
    # ('out of range') on any non-finite input and quantile_cont
    # yields NaN where Spark's percentile sorts NaN last (measured).
    # The inner aggregates take isfinite-filtered input (throw-free —
    # DuckDB computes aggregates before the outer CASE can discard
    # them), and the outer CASE alone decides the output; min/max/sum
    # conventions agree raw on both engines (NaN greatest, Inf
    # propagates) so they stay unguarded. Clean groups are arithmetic-
    # identical to the unguarded form.
    oracle="""
    SELECT event_type,
           round(min(value) + 1e-9, 4) AS min_v,
           round(max(value) + 1e-9, 4) AS max_v,
           CASE WHEN bool_or(NOT isfinite(value)) THEN NULL
                ELSE round(stddev_samp(CASE WHEN isfinite(value)
                                       THEN value END) + 1e-9, 4)
           END AS sd_v,
           CASE WHEN bool_or(NOT isfinite(value)) THEN NULL
                ELSE round(var_samp(CASE WHEN isfinite(value)
                                    THEN value END) + 1e-9, 4)
           END AS var_v,
           CASE WHEN bool_or(NOT isfinite(value)) THEN NULL
                ELSE round(quantile_cont(CASE WHEN isfinite(value)
                                         THEN value END, 0.5)
                           + 1e-9, 4)
           END AS median_v
    FROM events
    GROUP BY event_type
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates incl. exact interpolated median. A group
    containing any non-finite value yields NULL sd/var/median on both
    engines (see the oracle comment — the guard exists because the
    engines otherwise crash or diverge on NaN/Inf fixture drift)."""
    events = catalog.load(spark, sf_dir, "events")
    nonfinite = F.isnan("value") | F.col("value").isin(
        float("inf"), float("-inf")
    )
    bad = F.bool_or(nonfinite)
    return events.groupBy("event_type").agg(
        fround(F.min("value")).alias("min_v"),
        fround(F.max("value")).alias("max_v"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(fround(F.stddev_samp("value")))
        .alias("sd_v"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(fround(F.var_samp("value")))
        .alias("var_v"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(fround(F.expr("percentile(value, 0.5)")))
        .alias("median_v"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT lang, string_agg(part_name, '//' ORDER BY part_name) AS names_joined
    FROM (
        SELECT d.lang AS lang, p.p_name AS part_name
        FROM documents d JOIN part p ON d.doc_id = p.p_partkey
    )
    GROUP BY lang
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list → sort → '//'-join as a grouped aggregate — the
    reference's A7 array→delimited-string op
    (``jira_base_processor.py:98-100``) lifted to a per-group aggregate."""
    documents = catalog.load(spark, sf_dir, "documents")
    part = catalog.load(spark, sf_dir, "part")
    joined = documents.join(part, documents.doc_id == part.p_partkey).select(
        "lang", F.col("p_name").alias("part_name")
    )
    return joined.groupBy("lang").agg(
        F.concat_ws("//", F.sort_array(F.collect_list("part_name"))).alias(
            "names_joined"
        )
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "agg_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
    FROM events
    GROUP BY user_id
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type counts per user. The pivot values are DECLARED
    (not discovered) — at scale an undeclared pivot needs an extra
    distinct pass over the fact table."""
    events = catalog.load(spark, sf_dir, "events")
    pivoted = (
        events.groupBy("user_id").pivot("event_type", EVENT_TYPES).count()
    )
    # pivot yields NULL for empty cells; count semantics say 0
    return pivoted.fillna(0, subset=EVENT_TYPES)


@query(
    "agg_mode_per_group",
    oracle="""
    WITH counts AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS mode_event_type, n
    FROM (
        SELECT user_id, event_type, n,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, event_type NULLS LAST)
                 AS rn
        FROM counts
    )
    WHERE rn = 1
    """,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group with a DETERMINISTIC tie-break
    (count desc, then lexicographic) — built-in mode() functions
    resolve ties arbitrarily and can't be differentially checked
    across engines. Two stages: a partial-agg count shuffle, then a
    per-user top-1 (WindowGroupLimit lowers the rn=1 filter, so only
    each group's best row survives the second exchange)."""
    events = catalog.load(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n")
    )
    # NULLS LAST pinned on BOTH engines: Spark's ASC default is NULLS
    # FIRST, DuckDB's is NULLS LAST — a NULL event_type tying a real
    # type's count would otherwise win the tie-break in one engine only
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc_nulls_last()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id", F.col("event_type").alias("mode_event_type"), "n"
        )
    )


@query(
    "agg_salted_skew",
    oracle="""
    SELECT l_returnflag,
           sum(l_quantity) AS sum_qty,
           count(*) AS n_rows,
           round(sum(l_quantity) / count(*) + 1e-9, 4) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation: lineitem grouped by l_returnflag — 3
    keys over the whole table, the textbook hot-key shape where a
    plain groupBy lands each key on ONE reducer and the stage runs at
    the speed of its slowest straggler. The salted two-phase operator
    (operators/salt.py) spreads every key over 16 partials first; the
    final exchange carries |keys| x 16 rows. The salt never leaks into
    the result — sums and counts re-combine exactly, and avg is
    derived sum/count AFTER the final combine (averaging partial avgs
    would weight salt buckets equally; deriving it post-combine is
    what makes the operator algebra-safe) — so the oracle is the plain
    GROUP BY."""
    from airflow_jira_etl_spark.operators.salt import salted_agg

    lineitem = catalog.load(spark, sf_dir, "lineitem")
    out = salted_agg(
        lineitem,
        ["l_returnflag"],
        {
            "sum_qty": (F.sum("l_quantity"), F.sum("sum_qty")),
            "n_rows": (F.count("*"), F.sum("n_rows")),
        },
    )
    return out.select(
        "l_returnflag",
        "sum_qty",
        "n_rows",
        fround(F.col("sum_qty") / F.col("n_rows")).alias("avg_qty"),
    )


@query(
    "agg_approx_quantiles",
    # Boolean-contract oracle: sketch internals are engine-specific, so
    # the hashed surface is per-group booleans claiming each
    # approximate quartile satisfies the sketch's actual guarantee —
    # ITS RANK INTERVAL [#(x<v)+1, #(x<=v)] intersects the target rank
    # window ceil((q±0.01)·n) ∓1 (0.01 = 100× the configured n/10000
    # rank error; the ±1 rank absorbs engine-definitional off-by-ones).
    # The r07 formulation bounded the discrete sketch VALUE by the
    # CONTINUOUS percentile envelope, which is unsatisfiable for groups
    # under ~76 rows (n=2: approx p25 = a but lo = a+0.24·(b−a)) — a
    # latent red had a fixture regen ever produced a small group. Rank
    # arithmetic is exact-integer, never interpolated, so it holds for
    # ANY group size. Spark computes sketch + rank counts in two scans;
    # the oracle expects every claim to hold.
    oracle="""
    SELECT o_orderstatus,
           TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate grouped quartiles via ``approx_percentile`` (the
    Greenwald-Khanna mergeable sketch): per order status, p25/p50/p75
    of o_totalprice at accuracy 10000 (rank error <= n/10000). The
    100 TB twin of agg_exact_quantiles (reports.py): the sketch is a
    bounded-size partial aggregate — one map-side pass, |groups|
    sketches across the exchange — where the exact rank-selection
    needs the full value multiset per group. The differential surface
    is the rank-interval boolean contract (see oracle): scan 1 builds
    the sketches, scan 2 broadcast-joins the |groups|-row result back
    and counts each value's <-rank and <=-rank — both scans are
    partial/final aggregates, no per-group multiset ever shuffles. The
    named tolerance test
    (tests/test_operators.py::test_approx_quantiles_within_rank_tolerance)
    additionally bounds the raw values."""
    orders = catalog.load(spark, sf_dir, "orders")
    q = F.expr(
        "approx_percentile(o_totalprice, array(0.25, 0.5, 0.75), 10000)"
    )
    agged = orders.groupBy("o_orderstatus").agg(
        q.alias("qv"), F.count("o_totalprice").alias("n")
    )
    joined = orders.select("o_orderstatus", "o_totalprice").join(
        F.broadcast(agged), "o_orderstatus"
    )
    ranked = joined.groupBy("o_orderstatus").agg(
        F.first("n").alias("n"),
        *[
            agg
            for i in (1, 2, 3)
            for agg in (
                F.sum(
                    (F.col("o_totalprice") < F.element_at("qv", i)).cast("long")
                ).alias(f"lt{i}"),
                F.sum(
                    (F.col("o_totalprice") <= F.element_at("qv", i)).cast("long")
                ).alias(f"le{i}"),
            )
        ],
    )

    def ok(i: int, qq: float) -> F.Column:
        # the value's rank interval must touch the target rank window,
        # clamped to [1, n] so q·n margins stay meaningful at the ends
        target_lo = F.greatest(
            F.lit(1), F.ceil(F.lit(qq - 0.01) * F.col("n")) - 1
        )
        target_hi = F.least(
            F.col("n"), F.ceil(F.lit(qq + 0.01) * F.col("n")) + 1
        )
        return (F.col(f"le{i}") >= target_lo) & (F.col(f"lt{i}") < target_hi)

    return ranked.select(
        "o_orderstatus",
        ok(1, 0.25).alias("p25_ok"),
        ok(2, 0.50).alias("p50_ok"),
        ok(3, 0.75).alias("p75_ok"),
    )


@query(
    "agg_percentile_cont",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.25) + 1e-9, 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50) + 1e-9, 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75) + 1e-9, 4) AS p75
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated (continuous) grouped quartiles — percentile_cont
    semantics, the third member of the quantile family next to
    agg_exact_quantiles (discrete rank selection) and
    agg_approx_quantiles (mergeable sketch). Exact percentile needs the
    full value multiset per group (one shuffle on the 3-value group
    key); use the sketch twin when groups are huge."""
    orders = catalog.load(spark, sf_dir, "orders")
    q = F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))")
    return orders.groupBy("o_orderstatus").agg(
        fround(F.element_at(q, 1)).alias("p25"),
        fround(F.element_at(q, 2)).alias("p50"),
        fround(F.element_at(q, 3)).alias("p75"),
    )
