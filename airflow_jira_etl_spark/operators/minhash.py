"""MinHash-LSH near-duplicate detection, hand-rolled and deterministic.

The 100 TB dedup path: an all-pairs similarity join is quadratic and
impossible at scale; MinHash-LSH reduces it to (1) a linear signature
pass, (2) a band-bucket shuffle, (3) pairwise verification only within
buckets. All three stages are built-in DataFrame ops — the signature
uses ``xxhash64`` (JVM, codegen) instead of spark.ml's ``MinHashLSH``
so the hash family is explicit and seed-stable across runs (no fitted
model state).

Pipeline:
  tokens → k-shingles → shingle hashes (8-byte longs — strings are
  hashed ONCE and never carried into the shuffle; the band join and
  the Jaccard verify both run over long arrays)
         → H min-hashes (one aggregate pass, no explode)
         → B bands of R rows (H = B·R) → band-hash buckets
         → candidate pairs within buckets → Jaccard verify on the
           hashed shingle sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airflow_jira_etl_spark.functions.rounding import fround

N_HASHES = 16
N_BANDS = 4  # rows per band R = N_HASHES / N_BANDS = 4


def shingles(tokens: Column, k: int = 3) -> Column:
    """k-shingles (word n-grams) of a token array. NOT deduplicated:
    every consumer is duplicate-insensitive (min-hash ignores repeats;
    array_intersect/array_union have set semantics), and array_distinct
    costs more than the whole signature pass.

    NULL tokens (a NULL document) yield NULL, not shingles: without
    the gate, ``greatest(size(NULL)-k, 0)`` silently skips the NULL
    and produces the EMPTY-STRING document's shingle set — a NULL doc
    would then minhash byte-identically to every empty doc (jaccard-1
    false 'duplicates') and DIVERGE from the row form
    (``shingle_hash_rows``), whose posexplode drops NULL docs; the two
    forms' byte-identical-signature contract requires both to treat a
    NULL doc as 'contributes nothing'."""
    n = F.size(tokens)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    out = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, k)))
    return F.when(tokens.isNull(), F.lit(None)).otherwise(out)


def shingle_hashes(tokens: Column, k: int = 3) -> Column:
    """64-bit shingle hashes — the compact representation all
    downstream stages operate on (may contain duplicates; see above)."""
    return F.transform(shingles(tokens, k), lambda s: F.xxhash64(s))


def minhash_signature(hashes: Column, n_hashes: int = N_HASHES) -> list[Column]:
    """One min-hash per seed as array aggregates — self-contained (no
    shuffle), but evaluated by the interpreted higher-order-function
    path. candidate_pairs uses the codegen explode→min-agg form below
    instead; this form remains for single-pass per-row use."""
    return [
        F.array_min(
            F.transform(hashes, lambda h: F.xxhash64(h, F.lit(seed)))
        ).alias(f"mh_{seed}")
        for seed in range(n_hashes)
    ]


def add_signature(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach mh_0..mh_{H-1} per row (array form). A NULL document
    carries a NULL signature — band/bucket consumers must filter those
    out, exactly as the row form drops them at posexplode."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    # the '__sh' shingle-hash array (hundreds of longs per doc) is an
    # intermediate only — leaking it into the returned frame would make
    # every downstream persist/shuffle pay its width, exactly the cost
    # band_buckets' design avoids ("shingle sets do NOT travel")
    return (
        df.withColumn("__sh", shingle_hashes(toks))
        .select("*", *minhash_signature(F.col("__sh")))
        .drop("__sh")
    )


def shingle_hash_rows(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 3
) -> DataFrame:
    """(id, __h) — ONE ROW PER SHINGLE, entirely in whole-stage codegen:
    posexplode the tokens, window-lead the next k-1 tokens into each
    row, concat + xxhash64. Produces the same shingle multiset as the
    array form (``shingles``): positions 0..max(n-k, 0); concat_ws
    skips the NULL leads a short tail document leaves, matching the
    short-``slice`` shingle. The per-element interpreted lambda path is
    ~10× slower than this shape at equal output."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
            "__pos", "__tok"
        ),
    )
    w = Window.partitionBy(id_col).orderBy("__pos")
    wp = Window.partitionBy(id_col)
    leads = [F.col("__tok")] + [F.lead("__tok", i).over(w) for i in range(1, k)]
    # leads are computed BEFORE the position filter — a window after the
    # filter would see the trailing rows removed and truncate the last
    # k-1 shingles
    shingled = toks.select(
        id_col,
        "__pos",
        F.concat_ws(" ", *leads).alias("__s"),
        F.count("*").over(wp).alias("__n"),
    )
    return shingled.where(
        F.col("__pos") <= F.greatest(F.col("__n") - k, F.lit(0))
    ).select(id_col, F.xxhash64("__s").alias("__h"))


def minhash_table(
    rows: DataFrame, id_col: str, n_hashes: int = N_HASHES
) -> DataFrame:
    """(id, mh_0..mh_{H-1}) from per-shingle rows via per-id min
    aggregates: every xxhash64 and min combine runs inside whole-stage
    codegen with map-side partial aggregation — the shuffle carries
    only |ids| × H longs."""
    return rows.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64("__h", F.lit(seed))).alias(f"mh_{seed}")
            for seed in range(n_hashes)
        ]
    )


def band_buckets(df: DataFrame, id_col: str) -> DataFrame:
    """Emit (id, band_id, band_hash) — one NARROW row per band. The
    shingle sets deliberately do NOT travel through the bucket
    shuffle: at 440 hashes/doc they would dominate shuffle volume;
    they are re-attached only to the (few) surviving pairs."""
    rows_per_band = N_HASHES // N_BANDS
    bands = []
    for b in range(N_BANDS):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(
            F.struct(F.lit(b).alias("band_id"), F.xxhash64(*cols).alias("band_hash"))
        )
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(*bands)).alias("band"),
    ).select("id", "band.band_id", "band.band_hash")


def candidate_pairs(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """MinHash-LSH candidate pairs with Jaccard on the hashed shingle
    sets, deduplicated across bands. Returns (id1, id2, jaccard).

    Shuffle budget: the band self-join moves 3 longs/row; the shingle
    sets are joined back only for candidate pairs (|pairs| ≪ |docs|).
    The per-shingle hash rows are cached EAGERLY and once: they feed
    the minhash aggregation and the verify re-attach, each of which
    would otherwise recompute the shingling pass. (At 100 TB the same
    role is played by a materialized signature table on disk, as the
    IVF index does for vectors.)

    Cache HANDOFF: the returned frame depends on both caches, so this
    function cannot unpersist them — ownership passes to the caller's
    session (the bench/sweep harnesses clearCache between queries; a
    long-lived session doing repeated dedup sweeps should
    spark.catalog.clearCache() or persist the returned pairs and
    unpersist the inputs itself)."""
    rows = shingle_hash_rows(df, id_col, text_col).cache()
    rows.count()
    buckets = band_buckets(minhash_table(rows, id_col), id_col).cache()
    buckets.count()  # eager: both self-join sides read it; a cold cache
    # would be filled twice concurrently (minhash agg runs per side)
    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .dropDuplicates(["id1", "id2"])  # same pair may collide in >1 band
    )
    sets = rows.groupBy(id_col).agg(F.collect_list("__h").alias("sh")).select(
        F.col(id_col).alias("id"), "sh"
    )
    pairs_with_sets = (
        pairs.join(sets.select(F.col("id").alias("id1"), F.col("sh").alias("sh1")), "id1")
        .join(sets.select(F.col("id").alias("id2"), F.col("sh").alias("sh2")), "id2")
    )
    inter = F.size(F.array_intersect("sh1", "sh2")).cast("double")
    union = F.size(F.array_union("sh1", "sh2")).cast("double")
    return pairs_with_sets.select(
        "id1", "id2", fround(inter / union).alias("jaccard")
    )
