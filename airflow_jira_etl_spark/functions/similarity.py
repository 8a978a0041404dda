"""Vector similarity primitives — JVM-side, no Python in the hot path.

Cosine over ``array<float>`` embedding columns is expressed with
higher-order functions (``zip_with`` + ``aggregate``) so the whole
computation stays inside whole-stage codegen. Elements are cast to
double BEFORE accumulation: float32 accumulation loses ~7 digits and
makes cross-engine comparison (and ranking stability) flaky.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with double accumulation (sequential left fold)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm2(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    """Zero-norm convention: cs = 0.0 (a zero vector is similar to
    nothing), matching the guard in embedding_ops and its oracles. A
    plain division is a DIVIDE_BY_ZERO hard error under ANSI mode the
    moment a regenerated fixture ships a zero vector — try_divide
    yields NULL there, coalesced to 0.0. Every oracle using DuckDB's
    list_cosine_similarity (which returns -1.0 on a zero vector, not
    an error) must carry the matching CASE guard.

    A NULL input array stays NULL — an unconditional coalesce would
    rank an absent embedding as 0.0 (ABOVE genuinely negative
    similarities) while the SQL side's NULL sorts last; the 0.0
    convention is reserved for the zero-NORM case alone. That is why
    the zero-norm case is an EXPLICIT guard and not a
    coalesce(try_divide(...), 0.0): the coalesce form also caught the
    NULL a try_divide yields for a NULL dot product — a vector with a
    NULL ELEMENT, or a length-mismatched pair (zip_with pads with
    NULLs) — silently scoring corrupt embeddings 0.0 where the SQL
    side keeps them NULL (hash divergence on any fixture drift that
    ships one). Those now propagate NULL on both engines.

    The guard LADDER here and in :func:`cosine_sql` must stay
    decision-for-decision identical — it IS the cross-engine contract:
    NULL vector → NULL; length mismatch → NULL (decided BEFORE the
    zero-norm outcome, or a zero vector paired with a short one scores
    0.0 on one engine and NULL on the other); NULL or NaN element →
    NULL; zero norm (incl. empty vectors) → 0.0. The NaN rung exists
    because the engines DIVERGE on an unguarded NaN element (round 12,
    measured): Spark's fold propagates NaN while DuckDB's list_sum
    yields NULL — one NaN element in a regenerated fixture would
    hash-mismatch every similarity oracle. Infinity elements are NOT
    guarded: both engines propagate them to NaN identically (inf·0 or
    inf/inf), and the comparator canonicalizes NaN stably.

    Cost note: the corrupt-input tests are size/isNull scans (no
    multiplies), and the division keeps the single
    coalesce(try_divide) shape so the norm product is EVALUATED ONCE —
    an earlier form tested ``denom == 0`` in a when-branch and divided
    by denom in another, and codegen evaluated the two norm folds
    twice (~+70% on the pair-threshold query). For CLEAN inputs
    try_divide is NULL exactly when the norm product is 0 (a zero-norm
    side also zeroes the dot), so the coalesce's 0.0 is reached ONLY
    by the zero-norm case — the corrupt cases are already routed to
    NULL by the when."""
    corrupt = (
        a.isNull()
        | b.isNull()
        | (F.size(a) != F.size(b))
        | F.exists(a, lambda x: x.isNull() | F.isnan(x))
        | F.exists(b, lambda x: x.isNull() | F.isnan(x))
    )
    return F.when(corrupt, F.lit(None).cast("double")).otherwise(
        F.coalesce(
            F.try_divide(dot(a, b), F.sqrt(norm2(a)) * F.sqrt(norm2(b))),
            F.lit(0.0),
        )
    )


def cosine_sql(a: str, b: str) -> str:
    """The DuckDB mirror of :func:`cosine` for oracle SQL — ONE
    implementation of the guard ladder shared by every
    similarity-exposing oracle. Raw ``list_cosine_similarity`` is NOT
    drift-safe: it hard-errors on a list containing a NULL element
    ('can not contain NULL values') and on mismatched dimensions
    ('list dimensions must be equal') — inputs the Spark side
    deliberately scores NULL — and returns -1.0 on a zero vector where
    the engine convention is 0.0.

    CRITICALLY, a CASE guard around ``list_cosine_similarity`` is NOT
    enough: DuckDB's vectorized executor evaluates list-function
    branches EAGERLY over the whole chunk (verified on 1.0 — one
    corrupt row in a batch throws even when its CASE branch would
    discard the result), so the ELSE must be built from THROW-FREE
    arithmetic. ``list_zip`` pads a mismatch with NULLs, ``list_sum``
    skips them, and x/0 is NULL in DuckDB — the eager garbage those
    produce for corrupt rows is then discarded by the guards, which
    alone decide the OUTPUT. The dot/norm expansion is numerically
    identical to list_cosine_similarity (double accumulation, same
    order) and to the Spark fold. Empty vectors fold into the
    zero-norm branch via the coalesce (``list_sum([]) IS NULL``),
    matching Spark's empty-fold 0.0."""
    null_el = (
        f"len(list_filter({a}, x -> x IS NULL OR isnan(x))) > 0 "
        f"OR len(list_filter({b}, x -> x IS NULL OR isnan(x))) > 0"
    )
    zero_norm = (
        f"coalesce(list_sum([x * x FOR x IN {a}]), 0) = 0 "
        f"OR coalesce(list_sum([x * x FOR x IN {b}]), 0) = 0"
    )
    dot = f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
    norms = (
        f"sqrt(list_sum([x * x FOR x IN {a}])) "
        f"* sqrt(list_sum([x * x FOR x IN {b}]))"
    )
    return (
        f"CASE WHEN {a} IS NULL OR {b} IS NULL THEN NULL "
        f"WHEN len({a}) <> len({b}) THEN NULL "
        f"WHEN {null_el} THEN NULL "
        f"WHEN {zero_norm} THEN 0.0 "
        f"ELSE {dot} / ({norms}) END"
    )


# ------------------------------------------------- pair-join fast path

def vec_norm(a: Column) -> Column:
    """Per-ROW precompute for pair self-joins: ``sqrt(norm2(a))`` as its
    own column. Higher-order array expressions (zip_with/aggregate/
    exists) are evaluated INTERPRETED — they do not participate in
    whole-stage codegen — so every array pass inside a per-PAIR cosine
    costs real time times the candidate-pair count. A bucket self-join
    over n rows with mean bucket size b evaluates the pair expression
    ~n·b/2 times; the norms and corruption guards are functions of ONE
    row, so hoisting them into the (cached) signature relation turns
    ~7 interpreted array passes per pair into 2 (the dot product), with
    bit-identical arithmetic — sqrt per side then multiply is exactly
    the ``sqrt(norm2(a)) * sqrt(norm2(b))`` the in-pair form evaluates
    (r15 optimization round; measured 2.91 s -> 0.89 s on
    llm_sim_pairs_threshold and 3.24 s -> 1.39 s on
    llm_dedup_semantic_clusters at sf0.1, min-of-3)."""
    return F.sqrt(norm2(a))


def vec_corrupt(a: Column) -> Column:
    """Per-ROW half of :func:`cosine`'s corrupt-input guard: NULL array
    or any NULL/NaN element. The only per-PAIR rung left is the length
    mismatch (it needs both sides)."""
    return a.isNull() | F.exists(a, lambda x: x.isNull() | F.isnan(x))


def cosine_prestats(
    a: Column,
    b: Column,
    norm_a: Column,
    norm_b: Column,
    bad_a: Column,
    bad_b: Column,
) -> Column:
    """:func:`cosine` with the per-row invariants supplied as columns
    (from :func:`vec_norm` / :func:`vec_corrupt` computed BEFORE the
    join). Decision-for-decision the same guard ladder and the same
    double arithmetic in the same order as :func:`cosine` — NULL
    vector / length mismatch / NULL-or-NaN element → NULL; zero norm →
    0.0 via the single coalesce(try_divide) shape (see cosine's cost
    note; the norm PRODUCT is still evaluated once)."""
    corrupt = bad_a | bad_b | (F.size(a) != F.size(b))
    return F.when(corrupt, F.lit(None).cast("double")).otherwise(
        F.coalesce(F.try_divide(dot(a, b), norm_a * norm_b), F.lit(0.0))
    )
