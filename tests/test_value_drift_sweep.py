"""Whole-registry defense against CORRUPT-CONTENT drift in every float
measure column AND the JSON props column — the round-12 sibling of the
nanos (ts), documents, and embeddings sweeps. All nine measure columns
across events and the TPC-H tables are DOUBLE in the fixtures, so a
regeneration can ship NaN/±Inf into any of them; props is a plain
string, so it can ship malformed or non-object JSON.

JSON axis (fixed via the r12 JSON-drift sweep): DuckDB's json
functions HARD-ERROR on malformed JSON where Spark's
get_json_object/from_json yield NULL, its json_keys of a valid
non-object is [] where Spark's map_keys is NULL, and the Python UDTF
crashed the worker outright on malformed props — the three JSON
oracles now gate on json_valid (+ json_type='OBJECT' for keys), and
the UDTF treats malformed/non-object props as zero rows.

NULL event-time axis (fixed via the r12 NULL-ts sweep, ELEVEN
oracles): Spark's event-time window/session operators DROP rows with
a NULL event time where plain SQL buckets them (streaming oracles now
filter ts IS NOT NULL), and Spark's default ascending sort places
NULLS FIRST where DuckDB's places them LAST (every ts-ordered window
oracle now states NULLS FIRST explicitly — identical output on
NULL-free fixtures, pinned here under drift).

NULL-measure axis (r13): one NULL planted per float measure column —
the fourth drift shape next to NaN/±Inf. Sums/avgs/min/max/percentile
/stddev skip NULLs identically on both engines and comparisons with
NULL are false on both, so most of the registry needs no guard; the
exposure is ASC SORT KEYS over a nullable measure, where Spark
defaults NULLS FIRST and DuckDB NULLS LAST (they AGREE on DESC: both
last). The two ranker queries ordering on a measure
(agg_exact_quantiles' l_extendedprice, win_ntile_percent's c_acctbal)
now pin asc_nulls_last on the Spark side, matching DuckDB's default —
the llm_corpus_stats convention. RANGE frames over a nullable key
(win_range_frame) verified immune: both engines give the NULL row its
own peer frame and exclude NULLs from finite-bound frames, so the
per-row output is null-position-independent.

NULL-group/window axis (r13): DuckDB 1.0.0 has a RACE on the
NULL-group row of a threaded hash aggregate whose group key is a
date_trunc expression, when that row flows into a window — the row's
key nondeterministically reads as garbage downstream (~40% of runs:
lands mid-chain in the window sort, or passes an IS NOT NULL filter).
NULLS FIRST qualifiers and even a COALESCE-sentinel sort key do NOT
help; only keeping the NULL group out of the aggregate does.
report_monthly_growth now pre-filters o_orderdate IS NOT NULL before
its GROUP BY and aggregates the dateless bucket in a separate branch
(engine: window partitioned on month IS NULL — one pass, NULL month
alone in its partition). An r13 audit probed every other oracle shape
on the poisoned fixture (all 146 x 6 runs: deterministic; the
date_trunc group keys in flagship / stream_tumbling_* / watermark_late
are pre-filtered by range or IS NOT NULL predicates, and raw-column
group keys -> window are unaffected by the race).
test_monthly_growth_oracle_is_deterministic pins the repro shape.

Planting one NaN, one +Inf and one −Inf per column surfaced SIX real
contract gaps before this sweep existed (all fixed, conventions stated
where they live):

- DuckDB's STDDEV_SAMP/VAR_SAMP HARD-ERROR ('out of range') on any
  non-finite input, and quantile_cont yields NaN where Spark's
  percentile sorts NaN last → agg_stats carries a non-finite → NULL
  guard rung on both engines;
- a NaN aggregate crossing the pandas/Arrow bridge back to Spark
  arrives as NULL while plain SQL keeps NaN → the udaf_grouped_agg
  and stream_stateful_profile oracles pin the bridge convention;
- Spark's ANSI double→int cast throws on NaN (case_when_cast's
  qty_int, fn_math_suite's sign cast) and its raw ceil silently maps
  NaN → 0 / Inf → Long.MaxValue, while DuckDB's CAST hard-errors →
  the integer-cast outputs carry non-finite → NULL guards on both
  engines;
- Spark's double→decimal cast NULLs non-finite (sum skips) where
  DuckDB's CAST hard-errors → join_bucketed_colocated's oracle
  mirrors the skip with an isfinite gate.

min/max/sum/avg/round/abs/pow need no guard: both engines agree raw
(NaN greatest, Inf propagates, NaN canonicalized stably by the
comparator), which this sweep keeps verified.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from airflow_jira_etl_spark import catalog, registry
from tests.oracle_check import compare, duckdb_conn

registry.load_all_queries()

SRC = "/root/testdata/sf0.01"

POISON = {
    "events": ["value"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "customer": ["c_acctbal"],
    "orders": ["o_totalprice"],
    "part": ["p_retailprice"],
    "supplier": ["s_acctbal"],
}

# date columns NULLed in the same fixture (swept r12: date-range
# filters exclude NULLs and min/max skip them IDENTICALLY on both
# engines — 53/53 green with no oracle changes needed; kept poisoned
# so the symmetry stays verified rather than assumed)
NULL_DATES = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate", "l_commitdate", "l_receiptdate"],
}


def build_nonfinite_fixture(tmp: str) -> str:
    """Materialize the poisoned copy into ``tmp`` — importable so
    tools/oracle_determinism.py can scan the SAME fixture the sweep
    tests use (VERDICT r13 item 7)."""
    for t in catalog.TABLES:
        p = catalog.table_path(SRC, t)
        if t not in POISON:
            os.symlink(p, os.path.join(tmp, os.path.basename(p)))
            continue
        tbl = pq.read_table(p)
        nrow = tbl.num_rows
        for ci, col in enumerate(POISON[t]):
            vals = tbl.column(col).to_pylist()
            # four rows, four shapes, offsets varied per column so
            # they land in different groups/users/keys
            taken = {
                (11 + 13 * ci) % nrow,
                (101 + 17 * ci) % nrow,
                (211 + 19 * ci) % nrow,
            }
            vals[(11 + 13 * ci) % nrow] = float("nan")
            vals[(101 + 17 * ci) % nrow] = float("inf")
            vals[(211 + 19 * ci) % nrow] = float("-inf")
            # NULL-measure axis (r13): a NULL value in every float
            # measure — the fourth shape a regeneration can ship.
            # Collision-stepped so tiny tables (supplier ~100 rows at
            # sf0.01) keep all four shapes distinct.
            null_idx = (307 + 23 * ci) % nrow
            while null_idx in taken:
                null_idx = (null_idx + 1) % nrow
            vals[null_idx] = None
            tbl = tbl.set_column(
                tbl.schema.get_field_index(col),
                col,
                pa.array(vals, tbl.schema.field(col).type),
            )
        for ci, col in enumerate(NULL_DATES.get(t, [])):
            if col not in tbl.schema.names:
                continue
            vals = tbl.column(col).to_pylist()
            for idx in (37, 997, 2999):
                vals[(idx + 7 * ci) % nrow] = None
            tbl = tbl.set_column(
                tbl.schema.get_field_index(col),
                col,
                pa.array(vals, tbl.schema.field(col).type),
            )
        if t == "events":  # the JSON axis rides the same fixture
            vals = tbl.column("props").to_pylist()
            vals[7 % nrow] = '{"k": 1,,}'  # malformed
            vals[1001 % nrow] = ""  # empty string
            vals[2003 % nrow] = None  # NULL
            vals[3005 % nrow] = '"just a string"'  # valid non-object
            vals[4007 % nrow] = "[1,2,3]"  # valid array
            tbl = tbl.set_column(
                tbl.schema.get_field_index("props"),
                "props",
                pa.array(vals, tbl.schema.field("props").type),
            )
            # the NULL event-time axis (r12): one NULL ts broke 11
            # oracles two ways — Spark's event-time operators DROP
            # NULL-ts rows where plain SQL buckets them (streaming
            # oracles now filter ts IS NOT NULL), and Spark's default
            # sort is NULLS FIRST where DuckDB's is NULLS LAST (every
            # ts-ordered window oracle now says NULLS FIRST)
            vals = tbl.column("ts").to_pylist()
            for idx in (13, 1013, 2017):
                vals[idx % nrow] = None
            tbl = tbl.set_column(
                tbl.schema.get_field_index("ts"),
                "ts",
                pa.array(vals, tbl.schema.field("ts").type),
            )
            # the NULL group-key axis (r12): SQL aggregation has a
            # NULL group, so the incremental MV must FOLD a NULL
            # user_id like its GROUP BY oracle does — the entity-key
            # NULL refusal mis-fired on it until the MV's table opened
            # with null_keys='group'
            # the NULL entity-key axis (r15, the third keyed family
            # after doc_id r14 / vec_id r14): event_id is the events
            # table's identity — a dropDuplicates key
            # (stream_dedup_keys), the upsert key (sink_upsert — the
            # reference's db_ops.py:29-43 contract says a NULL
            # unique_column row cannot be upsert-addressed), the
            # latest-per-key tie-break (cdc, asof, windows), and an
            # arithmetic operand (bitwise suite). Three NULL
            # event_ids; row 1501 also carries the r12 NULL user_id,
            # so one row is entirely key-less (unaddressable by any
            # entity key).
            for col, idxs in (
                ("event_id", (41, 1501, 3301)),
                ("user_id", (23, 1501)),
                ("event_type", (31, 2501)),
            ):
                vals = tbl.column(col).to_pylist()
                for idx in idxs:
                    vals[idx % nrow] = None
                tbl = tbl.set_column(
                    tbl.schema.get_field_index(col),
                    col,
                    pa.array(vals, tbl.schema.field(col).type),
                )
        pq.write_table(
            tbl, os.path.join(tmp, os.path.basename(p)), store_schema=False
        )
    return tmp


@pytest.fixture(scope="module")
def nonfinite_fixture(tmp_path_factory):
    return build_nonfinite_fixture(str(tmp_path_factory.mktemp("valuedrift")))


def test_all_oracles_survive_nonfinite_measures(spark, nonfinite_fixture):
    con = duckdb_conn(nonfinite_fixture)
    names = sorted(
        n
        for n, sql in registry.ORACLES.items()
        if any(t in sql.lower() for t in POISON)
    )
    assert len(names) >= 100  # nearly the whole registry reads one
    failures = {}
    for name in names:
        try:
            r = compare(
                registry.QUERIES[name](spark, nonfinite_fixture),
                con,
                registry.ORACLES[name],
            )
            if r["errors"]:
                failures[name] = r["errors"][:2]
        except Exception as exc:  # noqa: BLE001 — collect, report below
            failures[name] = [f"raised: {exc!r:.200}"]
    assert not failures, (
        f"{len(failures)} oracle(s) diverge under non-finite measure "
        f"drift: {failures}"
    )


def test_monthly_growth_oracle_is_deterministic(nonfinite_fixture):
    """Regression pin for the r13 DuckDB 1.0.0 NULL-group race (module
    docstring, NULL-group/window axis): with a NULL o_orderdate in the
    fixture, the OLD oracle (GROUP BY date_trunc month incl. the NULL
    group -> lag window) returned a different chain ~40% of runs — the
    NULL-group row's key read as garbage in the window sort. The fixed
    oracle pre-filters the NULL group out of the aggregate, so
    repeated runs must be bit-identical (NaN-normalized: the poisoned
    revenue months legitimately carry NaN, and nan != nan would make
    every run look distinct)."""
    import math

    con = duckdb_conn(nonfinite_fixture)
    sql = registry.ORACLES["report_monthly_growth"]

    def norm(rows):
        return tuple(
            sorted(
                (
                    tuple(
                        "NAN"
                        if isinstance(v, float) and math.isnan(v)
                        else str(v)
                        for v in r
                    )
                    for r in rows
                ),
                key=str,
            )
        )

    results = {norm(con.execute(sql).fetchall()) for _ in range(12)}
    assert len(results) == 1, (
        f"oracle nondeterministic across runs: {len(results)} distinct "
        f"result sets — the DuckDB NULL-group race is back in the plan"
    )
    # and the NULL bucket itself is present exactly once, growth NULL
    (only,) = results
    null_rows = [r for r in only if r[0] == "None"]
    assert len(null_rows) == 1 and null_rows[0][2] == "None"
