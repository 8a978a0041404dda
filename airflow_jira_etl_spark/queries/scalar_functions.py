"""Scalar function suites — SURVEY.md §2B "Scalar functions".

String/date/math/array/map-json/conditional surfaces over the fixture
tables — the expression vocabulary the reference's mappings imply
(display-name/url munging ``users_processor.py:20``, DATE/TIME/TIMESTAMP
columns ``fetch_jira_tempo_worklogs.py:86-90``, '//'-joined labels
``jira_base_processor.py:98-100``). All built-in ``pyspark.sql.functions``
— JVM-side, whole-stage-codegen'd; no Python in the hot path.

Cross-engine type discipline: functions whose return types differ
across engines (year→int vs bigint, ceil→long vs double) are cast
explicitly on BOTH sides so the oracle schema compare is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.functions.rounding import fround
from airflow_jira_etl_spark.registry import query


@query(
    "fn_string_suite",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           substr(c_name, 10, 5) AS name_mid,
           trim(concat('  ', c_name, '  ')) AS name_trimmed,
           CAST(length(c_name) AS INTEGER) AS name_len,
           concat(c_name, '@', c_mktsegment) AS name_tagged,
           replace(c_name, 'Customer', 'User') AS name_replaced,
           regexp_extract(c_name, '([0-9]+)$', 1) AS name_num
    FROM customer
    """,
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substr/trim/length/concat/replace/regexp_extract —
    the display-name & url munging the reference's mappings imply."""
    customer = catalog.load(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 10, 5).alias("name_mid"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        F.length("c_name").cast("int").alias("name_len"),
        F.concat(F.col("c_name"), F.lit("@"), F.col("c_mktsegment")).alias(
            "name_tagged"
        ),
        F.regexp_replace("c_name", "Customer", "User").alias("name_replaced"),
        F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("name_num"),
    )


@query(
    "fn_date_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month_num,
           CAST(day(o_orderdate) AS INTEGER) AS order_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INTEGER)
             AS days_to_2002,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week
    FROM orders
    """,
)
def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/date_trunc/datediff/date_add/last_day/weekofyear
    on the order-date column (the reference's DATE/TIMESTAMP columns,
    ``fetch_jira_tempo_worklogs.py:86-90``)."""
    orders = catalog.load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month_num"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        F.date_add(F.col("o_orderdate"), 30).alias("due_date"),
        F.last_day("o_orderdate").alias("month_end"),
        F.weekofyear("o_orderdate").alias("iso_week"),
    )


@query(
    "fn_timestamp_parse",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S')
             AS ts_reparsed,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_unix_sec,
           CAST(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)) AS TIMESTAMP)
             AS ts_from_unix,
           CAST(ts AS DATE) AS ts_date
    FROM events
    """,
)
def fn_timestamp_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format → parse round-trip + unix-seconds round-trip (the
    reference's TIME/TIMESTAMP text columns parsed on ingest)."""
    events = catalog.load(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss"
    ts_str = F.date_format("ts", fmt)
    return events.select(
        "event_id",
        ts_str.alias("ts_str"),
        F.to_timestamp(ts_str, fmt).alias("ts_reparsed"),
        F.unix_timestamp("ts").alias("ts_unix_sec"),
        F.timestamp_seconds(F.unix_timestamp("ts")).alias("ts_from_unix"),
        F.col("ts").cast("date").alias("ts_date"),
    )


@query(
    "fn_math_suite",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice + 1e-9, 2) AS price_2dp,
           abs(o_totalprice - 250000.0) AS dist_from_mid,
           -- non-finite -> NULL on BOTH engines for the integer-cast
           -- outputs (r12 non-finite sweep): DuckDB's CAST hard-errors
           -- on ceil(NaN/Inf); Spark's ceil silently maps NaN -> 0 and
           -- Inf -> Long.MaxValue (a trap, not a convention) and its
           -- ANSI int cast of sign(NaN) throws. sign of ±Inf is a
           -- clean ±1 on both engines, so above_mid guards NaN only.
           CASE WHEN isfinite(o_totalprice)
                THEN CAST(ceil(o_totalprice / 1000.0) AS BIGINT)
           END AS price_k_ceil,
           CASE WHEN isfinite(o_totalprice)
                THEN CAST(floor(o_totalprice / 1000.0) AS BIGINT)
           END AS price_k_floor,
           round(pow(o_totalprice / 100000.0, 2) + 1e-9, 4) AS price_sq,
           round(sqrt(CASE WHEN o_totalprice >= 0 THEN o_totalprice END) + 1e-9, 4)
               AS price_sqrt,
           round(ln(CASE WHEN o_totalprice > 0 THEN o_totalprice END) + 1e-9, 4)
               AS price_ln,
           CAST(o_orderkey % 10 AS BIGINT) AS key_mod,
           CASE WHEN NOT isnan(o_totalprice)
                THEN CAST(sign(o_totalprice - 250000.0) AS INTEGER)
           END AS above_mid
    FROM orders
    """,
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/pow/sqrt/ln/mod/sign. The integer-cast
    outputs carry a non-finite → NULL guard on both engines (see the
    oracle comment): Spark's raw ceil maps NaN → 0 / Inf → Long.Max
    silently and its ANSI int cast of sign(NaN) throws."""
    orders = catalog.load(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    finite = ~(F.isnan(p) | p.isin(float("inf"), float("-inf")))
    return orders.select(
        "o_orderkey",
        fround(p, 2).alias("price_2dp"),
        F.abs(p - 250000.0).alias("dist_from_mid"),
        F.when(finite, F.ceil(p / 1000.0)).alias("price_k_ceil"),
        F.when(finite, F.floor(p / 1000.0)).alias("price_k_floor"),
        fround(F.pow(p / 100000.0, 2)).alias("price_sq"),
        # domain-guarded on BOTH engines: sqrt/ln of out-of-domain input
        # is NULL by convention (Spark yields NaN/NULL, DuckDB raises —
        # a regenerated fixture with negative money would otherwise
        # error the oracle run; see tests/test_tpch_content_drift_sweep)
        fround(F.sqrt(F.when(p >= 0, p))).alias("price_sqrt"),
        fround(F.log(F.when(p > 0, p))).alias("price_ln"),
        (F.col("o_orderkey") % 10).alias("key_mod"),
        F.when(~F.isnan(p), F.signum(p - 250000.0).cast("int")).alias(
            "above_mid"
        ),
    )


@query(
    "fn_array_suite",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    )
    SELECT doc_id,
           unnest(tokens) AS token,
           CAST(len(tokens) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(tokens)) AS INTEGER) AS n_distinct,
           list_contains(tokens, 'spark') AS has_spark,
           list_sort(tokens)[1] AS min_token
    FROM toks
    """,
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split→array, explode, size, array_distinct, array_contains,
    sort_array — the inverse of the reference's A7 (recover the labels
    array from the '//'-joined string)."""
    documents = catalog.load(spark, sf_dir, "documents")
    toks = documents.select(
        "doc_id", F.split(F.col("text"), " ").alias("tokens")
    )
    return toks.select(
        "doc_id",
        F.explode("tokens").alias("token"),
        F.size("tokens").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_distinct"),
        F.array_contains("tokens", "spark").alias("has_spark"),
        F.element_at(F.sort_array("tokens"), 1).alias("min_token"),
    )


@query(
    "fn_map_json_suite",
    # the vp (validated-props) indirection is the r12 JSON-drift armor:
    # DuckDB's json functions HARD-ERROR on malformed JSON where
    # Spark's get_json_object/from_json yield NULL (json_valid itself
    # never throws, and json fns of the NULLed-out vp are NULL-safe).
    # The OBJECT gate on the keys columns pins the non-object
    # convention: Spark's map_keys(from_json('[1,2,3]')) is NULL while
    # DuckDB's json_keys is [] — ungated, a valid-array props row would
    # hash-mismatch ''-vs-NULL.
    oracle="""
    SELECT event_id,
           json_extract_string(vp, '$.k') AS k_str,
           CAST(json_extract_string(vp, '$.k') AS INTEGER) AS k_int,
           array_to_string(CASE WHEN json_type(vp) = 'OBJECT'
                                THEN json_keys(vp) END, ',') AS keys_joined,
           CAST(len(CASE WHEN json_type(vp) = 'OBJECT'
                         THEN json_keys(vp) END) AS INTEGER) AS n_keys
    FROM (SELECT event_id,
                 CASE WHEN json_valid(props) THEN props END AS vp
          FROM events)
    """,
)
def fn_map_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / from_json-to-map / map_keys on the JSON props
    column (the reference's nested-JSON access, A5)."""
    events = catalog.load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        # concat_ws maps a NULL array to '' — a NULL/unparseable props
        # must stay NULL like the oracle's array_to_string(NULL, ',')
        # (same guard as project_array_join and the mapping compiler)
        F.when(F.map_keys(m).isNull(), F.lit(None))
        .otherwise(F.concat_ws(",", F.map_keys(m)))
        .alias("keys_joined"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@query(
    "fn_conditional_suite",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_filled,
           nullif(o_orderpriority, '3-MEDIUM') AS prio_or_null,
           CAST(coalesce(nullif(o_orderpriority, '3-MEDIUM'), o_orderstatus) IS NULL
                AS BOOLEAN) AS both_null,
           greatest(o_totalprice, 250000.0) AS price_floor_mid,
           least(o_totalprice, 250000.0) AS price_cap_mid
    FROM orders
    """,
)
def fn_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce/nullif/greatest/least (the reference's null-heavy rows —
    SURVEY.md §2A heterogeneous-rows note)."""
    orders = catalog.load(spark, sf_dir, "orders")
    prio_or_null = F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
    return orders.select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")
        ).alias("status_filled"),
        prio_or_null.alias("prio_or_null"),
        F.coalesce(prio_or_null, F.col("o_orderstatus")).isNull().alias("both_null"),
        F.greatest(F.col("o_totalprice"), F.lit(250000.0)).alias("price_floor_mid"),
        F.least(F.col("o_totalprice"), F.lit(250000.0)).alias("price_cap_mid"),
    )


@query(
    "fn_hash_suite",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex,
           md5(text || ':' || CAST(doc_id AS VARCHAR)) AS salted_md5,
           substring(sha256(text), 1, 16) AS sha_prefix
    FROM documents
    """,
)
def fn_hash_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic content hashing — the content-addressing primitive
    under exact dedup, cache keys, and dataset versioning: md5 and
    sha256 hex digests (bit-identical across engines by definition), a
    salted variant, and the truncated prefix used as a shard/bucket
    key. All JVM codegen, no shuffle; at 100 TB this is the cheapest
    possible per-row pass and the basis of llm_dedup_exact's key."""
    documents = catalog.load(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        F.md5(
            F.concat(F.col("text"), F.lit(":"), F.col("doc_id").cast("string"))
        ).alias("salted_md5"),
        F.substring(F.sha2(F.col("text"), 256), 1, 16).alias("sha_prefix"),
    )


@query(
    "fn_bitwise_suite",
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 16 AS with_flag,
           xor(event_id, 21845) AS toggled,
           event_id << 3 AS shl3,
           event_id >> 2 AS shr2,
           CAST(bit_count(event_id) AS INTEGER) AS popcount
    FROM events WHERE event_id < 2000
    """,
)
def fn_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator suite — flag fields, bit-packed ids, hash
    mixing all live on these. Pure codegen expressions, no shuffle;
    popcount (bit_count) is the building block for Hamming distance
    over packed signatures (the SimHash verify step at scale)."""
    events = catalog.load(spark, sf_dir, "events")
    return events.where(F.col("event_id") < 2000).select(
        "event_id",
        F.expr("event_id & 255").alias("low_byte"),
        F.expr("event_id | 16").alias("with_flag"),
        F.expr("event_id ^ 21845").alias("toggled"),
        F.expr("shiftleft(event_id, 3)").alias("shl3"),
        F.expr("shiftright(event_id, 2)").alias("shr2"),
        F.expr("bit_count(event_id)").alias("popcount"),
    )
