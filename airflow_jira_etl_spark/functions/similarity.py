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
    ships one). Those now propagate NULL on both engines."""
    denom = F.sqrt(norm2(a)) * F.sqrt(norm2(b))
    return F.when(
        a.isNull() | b.isNull(), F.lit(None).cast("double")
    ).when(denom == 0, F.lit(0.0)).otherwise(F.try_divide(dot(a, b), denom))
