"""Embedding-table operators beyond similarity search: per-class
centroids and nearest-centroid assignment — the label-side primitives
of a training-data pipeline (cluster prototypes, weak-label assignment,
drift checks), complementing the ANN queries in llm_ops/llm_extras.

Scale shape: both queries reduce the n×d embedding table through ONE
partial→final aggregate keyed by (label, position) — k·d result rows
regardless of corpus size — and the assignment pass broadcasts those
k centroids back over a single scan. Nothing here shuffles vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.functions.rounding import fround
from airflow_jira_etl_spark.functions.similarity import cosine, cosine_sql, norm2
from airflow_jira_etl_spark.registry import query


def _centroid_components(emb: DataFrame) -> DataFrame:
    """(label, pos0, cv): mean embedding component per label. posexplode
    feeds a (label, position)-keyed aggregate — map-side partial means
    the shuffle carries k·d partial sums, not n·d element rows."""
    ex = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos0", "v"
        ),
    )
    return ex.groupBy("label", "pos0").agg(F.avg("v").alias("cv"))


@query(
    "llm_embed_centroids",
    # (struct-list comprehension instead of UNNEST WITH ORDINALITY,
    # which this DuckDB build does not implement)
    # the trailing + 0.0 normalizes IEEE negative zero: embedding
    # components are zero-mean, so a per-(label,pos) average can sit
    # within summation error of 0 and round to -0.0 in one engine and
    # 0.0 in the other — adding positive zero collapses both to 0.0
    oracle="""
    SELECT label, CAST(u.pos AS INTEGER) AS pos,
           round(avg(u.v) + 1e-9, 4) + 0.0 AS centroid_v
    FROM (
        SELECT label,
               unnest([{'pos': i - 1, 'v': CAST(embedding[i] AS DOUBLE)}
                       FOR i IN range(1, len(embedding) + 1)]) AS u
        FROM embeddings
    )
    GROUP BY label, u.pos
    """,
)
def llm_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding, one row per (label, dimension). The
    whole n×64 table folds into k×64 rows in a single partial→final
    aggregate — at 100 TB the shuffle moves k·d·n_partitions partial
    sums (kilobytes), never vectors. Elements are cast to double
    BEFORE averaging (float32 accumulation drifts across engines)."""
    emb = catalog.load(spark, sf_dir, "embeddings")
    return _centroid_components(emb).select(
        "label",
        F.col("pos0").cast("int").alias("pos"),
        # + 0.0 collapses -0.0/0.0 (see oracle comment)
        (fround(F.col("cv")) + F.lit(0.0)).alias("centroid_v"),
    )


@query(
    "llm_embed_knn_assign",
    oracle="""
    WITH expl AS (
        SELECT label, u.pos AS pos, avg(u.v) AS cv
        FROM (
            SELECT label,
                   unnest([{'pos': i, 'v': CAST(embedding[i] AS DOUBLE)}
                           FOR i IN range(1, len(embedding) + 1)]) AS u
            FROM embeddings
        )
        GROUP BY label, u.pos
    ),
    cent AS (
        SELECT label AS c_label, list(cv ORDER BY pos) AS c
        FROM expl GROUP BY label
    ),
    scored AS (
        -- __CS__ expands to functions/similarity.cosine_sql: the
        -- shared guard ladder (NULL list / dim mismatch / NULL
        -- element -> NULL, zero norm -> 0.0) mirroring the Spark
        -- side's cosine branch-for-branch; CASE short-circuits so
        -- list_cosine_similarity never sees a corrupt input
        SELECT e.vec_id, e.label, c.c_label,
               round(__CS__ + 1e-9, 4) + 0.0 AS cs
        -- NULL-id rows drop from the KEYED assignment (they'd merge
        -- into one NULL partition below); centroids above still
        -- average every embedding (r14 NULL-key convention)
        FROM embeddings e, cent c
        WHERE e.vec_id IS NOT NULL
    ),
    ranked AS (
        SELECT vec_id, label, c_label, cs,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cs DESC, c_label) AS rn
        FROM scored
    )
    SELECT vec_id, label,
           -- a NULL embedding has NULL cs against EVERY centroid: no
           -- nearest centroid exists, so the assignment is NULL (the
           -- engine side's all-NULL packed-key max) — row_number alone
           -- would still crown the smallest label among NULL-cs rows
           CASE WHEN cs IS NULL THEN NULL ELSE c_label END
             AS assigned_label,
           cs AS cos_sim
    FROM ranked WHERE rn = 1
    """.replace(
        "__CS__", cosine_sql("CAST(e.embedding AS DOUBLE[])", "c.c")
    ),
)
def llm_embed_knn_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment (1-NN against class prototypes):
    every vector gets the label of its closest per-class mean, plus its
    true label for a drift/agreement readout. The k centroids assemble
    on k·d rows and BROADCAST; scoring is a map-side expand (n×k rows
    never shuffle raw), and the arg-max folds straight back down via a
    partial→final max over ONE PRIMITIVE LONG that encodes
    (rounded cs, tie-break label) — a struct-typed max would lose the
    mutable hash-agg buffer and silently compile to Sort +
    SortAggregate over the full n×k expand (observed; plan-guarded
    against in tests/test_scale_patterns.py). With the long key the
    plan is a pure HashAggregate and the only shuffle traffic is one
    8-byte key per vector. Ranking compares the 4-dp ROUNDED
    similarity (ties broken by smaller label) so the winner is
    engine-independent; the oracle's row_number form picks the
    identical row. The assignment is KEYED on vec_id, so NULL-id rows
    drop on both engines (r14 NULL-key convention: the engine's
    groupBy and the oracle's PARTITION BY would otherwise MERGE all
    identity-less vectors into one meaningless NULL-group row).
    Centroids still average over every embedding, id or not — the
    filter guards the keyed output, not the prototype means."""
    emb = catalog.load(spark, sf_dir, "embeddings")
    cent = (
        _centroid_components(emb)
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos0", "cv"))
            ).alias("pc")
        )
        .select(
            F.col("label").alias("c_label"),
            F.expr("transform(pc, x -> x.cv)").alias("c"),
        )
    )
    # the packed-key decode below assumes 0 ≤ label < 10⁶; validate on
    # the k-row centroid table BEFORE broadcast (negligible cost) so a
    # drifted fixture fails loudly instead of corrupting the decode —
    # NULL counts as out of domain (a NULL label would otherwise slip
    # through the comparison and silently drop its centroid)
    cent = cent.withColumn(
        "c_label",
        F.when(
            F.col("c_label").isNull()
            | (F.col("c_label") < 0)
            | (F.col("c_label") > 999999),
            F.raise_error(
                F.concat(
                    F.lit("llm_embed_knn_assign: label out of [0, 999999]: "),
                    F.coalesce(F.col("c_label").cast("string"), F.lit("NULL")),
                )
            ).cast("int"),
        ).otherwise(F.col("c_label")),
    )
    # per-SIDE cosine invariants precomputed ONCE (k rows / n rows) —
    # inlining them into the scoring expression would recompute O(d)
    # interpreted folds per (vector × centroid) row in the map-side
    # expand. r15: beyond the original zero-norm flags, the norms and
    # NULL/NaN corrupt guards are hoisted too (similarity.vec_norm /
    # vec_corrupt), leaving only the dot product per expanded row —
    # same guard ladder, same double arithmetic, bit-identical cs
    # (measured 0.72 s -> 0.64 s at sf0.1, min-of-3 — modest here
    # because k, the label count, is small; the hoist exists for the
    # n×k expand's scale shape).
    from airflow_jira_etl_spark.functions.similarity import (
        cosine_prestats,
        vec_corrupt,
        vec_norm,
    )

    cent = (
        cent.withColumn("c_zero", norm2(F.col("c")) == 0)
        .withColumn("c_nrm", vec_norm(F.col("c")))
        .withColumn("c_bad", vec_corrupt(F.col("c")))
    )
    emb_flagged = (
        emb.where(F.col("vec_id").isNotNull())
        .withColumn("e_zero", norm2(F.col("embedding")) == 0)
        .withColumn("e_nrm", vec_norm(F.col("embedding")))
        .withColumn("e_bad", vec_corrupt(F.col("embedding")))
    )
    pair_cos = cosine_prestats(
        F.col("embedding"),
        F.col("c"),
        F.col("e_nrm"),
        F.col("c_nrm"),
        F.col("e_bad"),
        F.col("c_bad"),
    )
    scored = emb_flagged.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "c_label",
        # + 0.0 collapses -0.0/0.0 so near-orthogonal scores rank
        # identically in both engines (ties then break by label);
        # zero-norm vectors define cs = 0.0 (matching the oracle's
        # guard) instead of the engine-divergent NaN
        F.when(F.col("e_zero") | F.col("c_zero"), F.lit(0.0))
        .otherwise(fround(pair_cos) + F.lit(0.0))
        .alias("cs"),
    )
    # arg-max by (cs, then SMALLER label), packed into one long so the
    # aggregate keeps a primitive mutable buffer (HashAggregate with
    # map-side partials — max over a struct degrades to SortAggregate):
    # cs is already rounded to 4 dp, so cs·10⁴ is integral in [-10⁴,10⁴];
    # key = cs_int·10⁶ + (10⁶-1-label) is monotone in (cs, -label).
    cs_int = F.round(F.col("cs") * 10000).cast("long")
    cs_key = cs_int * F.lit(1000000).cast("long") + (
        F.lit(999999) - F.col("c_label")
    )
    best = scored.groupBy("vec_id", "label").agg(
        F.max(cs_key).alias("k")
    )
    dec_int = F.floor(F.col("k") / 1000000)  # floor handles negative cs
    return best.select(
        "vec_id",
        "label",
        (F.lit(999999) - (F.col("k") - dec_int * 1000000))
        .cast("int")
        .alias("assigned_label"),
        # /10⁴ then +0.0 restores the 4-dp value (and positive zero)
        (dec_int.cast("double") / 10000.0 + F.lit(0.0)).alias("cos_sim"),
    )
