"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting (enabled in session.py) handles skewed JOINS
at runtime, but a groupBy whose hot key floods one reducer needs
salting: aggregate on (key, salt) first — spreading the hot key over
``n_salts`` reducers — then re-aggregate on the key. Works for any
algebraic aggregate (sum/count/min/max and their compositions such as
avg = sum/count).

At 100 TB this is the difference between one straggler task holding a
whole stage and N even tasks; the extra shuffle only carries
|keys|·n_salts rows, which is output-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a random salt.

    ``aggs`` maps output name -> (partial_agg_expr, final_agg_expr),
    where the partial expr runs over the salted groups and the final
    expr combines the per-salt partials, e.g.::

        salted_agg(df, ["k"], {
            "total": (F.sum("v"), F.sum("total")),
            "n":     (F.count("*"), F.sum("n")),
        })

    The salt is uniform-random per row (not key-derived): even a single
    key occupying 99% of rows spreads across all ``n_salts`` partials.
    """
    if _SALT in df.columns:
        # withColumn would silently REPLACE the user's column and the
        # groupBy would then aggregate under fabricated salt values —
        # the ranking module's _check_names collision class
        raise ValueError(
            f"input column {_SALT!r} collides with the salting helper "
            f"column — rename it before salting"
        )
    bad_out = set(aggs) & (set(keys) | {_SALT})
    if bad_out:
        # an output name shadowing a grouping key builds a partial
        # frame with two same-named columns; the final groupBy then
        # dies with AMBIGUOUS_REFERENCE pointing at internal plan state
        # instead of the misnamed aggregate — same loud-guard class as
        # the input collision above
        raise ValueError(
            f"aggregate output name(s) {sorted(bad_out)} collide with "
            f"the grouping keys / salting helper — pick different "
            f"output names"
        )
    partial_exprs = [expr.alias(name) for name, (expr, _) in aggs.items()]
    final_exprs = [fexpr.alias(name) for name, (_, fexpr) in aggs.items()]
    salted = df.withColumn(_SALT, (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
