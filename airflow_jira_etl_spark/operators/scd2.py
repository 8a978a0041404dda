"""Slowly-changing-dimension Type 2 merge.

The reference's sink is a keyed upsert that OVERWRITES attribute values
in place (``/root/reference/dags/jira/db_ops.py:29-43`` — ``ON CONFLICT
... DO UPDATE SET``); SCD2 is the history-preserving variant every
warehouse eventually needs: instead of overwriting, close the old
version (``valid_to``, ``is_current=false``) and append the new one.

Scale shape: the change batch is joined BROADCAST against the current
slice of the dimension — the dimension itself is never shuffled, and
rows whose key is absent from the batch stream through untouched. At
100 TB the dimension is the big side (billions of customers), the
daily change batch is the small side (thousands of rows); a shuffle
join keyed on the dimension would be the classic mistake here.

The merge deliberately avoids a single FULL OUTER join: Spark's
BroadcastHashJoin does not support full outer, so a broadcast hint on
one is SILENTLY IGNORED and the plan degrades to a SortMergeJoin that
hash-exchanges and sorts BOTH sides — the exact dimension shuffle this
module exists to avoid (verified on the executed plan; AQE cannot
rescue it either, its broadcast conversion skips full outer). Instead:

- ``cur LEFT OUTER JOIN broadcast(upd)`` (BroadcastHashJoin supports
  left-outer with a broadcast right/build side) covers passthrough,
  close-old-version, and open-changed-version rows in ONE unshuffled
  pass over the dimension;
- brand-new keys come from a key-only ``cur SEMI broadcast(upd)``
  probe (a column-pruned second scan of the dimension — cheap next to
  any shuffle of it) anti-joined back against the batch; both plans
  are broadcast-build-right and leave the dimension unexchanged.

Two dimension scans beat one dimension shuffle+sort by orders of
magnitude at the design scale. For a change batch too large to
broadcast, drop the hints and let AQE pick join sides — the plan
shape stays otherwise identical.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VERSION_COLS = ("valid_from", "valid_to", "is_current")


def scd2_merge(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    attrs: list[str],
    effective: str,
    ordinal_col: str | None = None,
) -> DataFrame:
    """Apply ``changes`` (key + new attribute values) to an SCD2
    dimension as of ``effective`` (a ``YYYY-MM-DD`` date literal).

    ``dim`` must carry ``valid_from``/``valid_to``/``is_current``;
    ``changes`` carries ``key`` + ``attrs`` (plus ``ordinal_col`` if
    given). Semantics:

    - key in changes, any attribute differs (null-safe): the current
      version is CLOSED (``valid_to = effective``, ``is_current=false``)
      and a new current version is appended with ``valid_from =
      effective``;
    - key in changes with identical attributes: no-op (no spurious
      version churn — the null-safe ``<=>`` diff is what prevents a
      re-sent unchanged row from forking history);
    - key not in changes: current version passes through untouched;
    - key in changes but not in dim: brand-new member, inserted as
      current with ``valid_from = effective``;
    - non-current history rows always pass through unchanged.

    Duplicate keys WITHIN the batch resolve last-writer-wins BEFORE the
    merge (operators/upsert semantics; pass ``ordinal_col`` for an
    explicit intra-batch order): without the dedup, the full-outer join
    would fan the one current dim row out per duplicate — duplicated
    closed rows plus multiple ``is_current=true`` versions of one key,
    compounding on every later merge. NULL keys in the batch raise via
    the same guard. A dim row whose ``is_current`` is NULL is history
    (NULL is not current) — the null-safe split below keeps it; a plain
    boolean filter pair would silently drop it from the output."""
    import datetime

    from airflow_jira_etl_spark.operators.upsert import upsert

    if not attrs:
        raise ValueError(
            "scd2_merge: attrs must be non-empty — with no tracked "
            "attributes there is nothing to diff, so no change could "
            "ever close or open a version (a key-only dimension wants "
            "a plain keyed upsert, not SCD2)"
        )
    # validate BEFORE building the plan: under ANSI mode a malformed
    # literal throws a generic cast error deep in execution; with ANSI
    # disabled (a common legacy deployment setting) it casts to NULL
    # silently — closed rows get valid_to=NULL and opened rows
    # valid_from=NULL, corrupting history with no signal anywhere
    try:
        datetime.date.fromisoformat(effective)
    except (TypeError, ValueError):
        raise ValueError(
            f"scd2_merge: effective must be a YYYY-MM-DD date literal, "
            f"got {effective!r} — a malformed date would NULL out "
            f"valid_from/valid_to under non-ANSI configs"
        ) from None
    # helper-name collisions REPLACE or ambiguate real data columns
    # (the upsert._check_merge_inputs class of hazard): a dim column
    # named like a __u_ shadow makes the diff read the wrong side
    # via an ambiguous-reference error at best
    helpers = {f"__u_{a}" for a in attrs} | {"__in_upd"}
    for side, df in (("dim", dim), ("changes", changes)):
        clash = sorted(helpers.intersection(df.columns))
        if clash:
            raise ValueError(
                f"scd2_merge: column(s) {clash} in {side} collide with "
                f"the merge's internal helper columns — rename them "
                f"before merging"
            )
    eff = F.lit(effective).cast("date")
    cur = dim.where(F.col("is_current").eqNullSafe(F.lit(True)))
    hist = dim.where(~F.col("is_current").eqNullSafe(F.lit(True)))

    deduped = upsert(
        changes.limit(0), changes, key, ordinal_col=ordinal_col
    )
    # presence marker survives NULL attribute values (a change row may
    # legitimately set an attribute to NULL — NULL-ness of an attr
    # column cannot stand in for "this side matched")
    upd = deduped.select(
        F.col(key),
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.lit(True).alias("__in_upd"),
    )
    # one unshuffled pass over the dimension (broadcast left outer —
    # see module docstring for why NOT a full outer)
    j = cur.join(F.broadcast(upd), on=key, how="left")

    in_upd = F.col("__in_upd").isNotNull()
    differs: Column = reduce(
        lambda a, b: a | b,
        [~F.col(a).eqNullSafe(F.col(f"__u_{a}")) for a in attrs],
    )
    changed = in_upd & differs  # unmatched rows have __u_* NULL, so
    # `differs` alone would misfire on them — gate on the marker

    # surviving current version of matched-but-unchanged / untouched keys
    passthrough = j.where(~changed).select(key, *attrs, *VERSION_COLS)
    closed = j.where(changed).select(
        key,
        *attrs,
        "valid_from",
        eff.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened_changed = j.where(changed).select(
        key,
        *[F.col(f"__u_{a}").alias(a) for a in attrs],
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    # brand-new keys: probe the dimension's KEY COLUMN ONLY (a pruned
    # second scan) for keys the batch matched, then anti-join the
    # batch against that ≤|batch|-row set — both joins broadcast the
    # small side, the dimension is never exchanged
    matched_keys = cur.select(key).join(
        F.broadcast(deduped.select(key)), on=key, how="semi"
    )
    opened_new = deduped.join(
        F.broadcast(matched_keys), on=key, how="anti"
    ).select(
        key,
        *attrs,
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return (
        hist.select(key, *attrs, *VERSION_COLS)
        .unionByName(passthrough)
        .unionByName(closed)
        .unionByName(opened_changed)
        .unionByName(opened_new)
    )
