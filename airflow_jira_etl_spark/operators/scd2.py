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

- ``dim LEFT OUTER JOIN broadcast(upd) ON key AND is_current`` (a
  BroadcastHashJoin — left-outer with a broadcast right/build side)
  covers history passthrough, current passthrough, close-old-version,
  and open-changed-version rows in ONE unshuffled pass over the
  dimension: each joined row EXPLODES into its one or two output rows
  (unchanged → itself; changed → closed + opened). Emitting those
  outcomes as three filtered SELECTs over the join and unioning them
  — the r11 form — physically re-executed the join per branch (Spark
  reuses exchanges across union arms, not unexchanged scans), so the
  "one pass" was really FOUR dimension scans; measured on a
  50M-row parquet dimension that form barely beat the full-outer
  shuffle it replaced. The explode form makes the one-pass claim
  physically true.
- brand-new keys come from a key-only ``cur SEMI broadcast(upd)``
  probe (a column-pruned second scan of the dimension — ReadSchema
  carries only (key, is_current) — cheap next to any shuffle of it)
  anti-joined back against the batch; both plans are
  broadcast-build-right and leave the dimension unexchanged.

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
    boolean filter pair would silently drop it from the output.

    Caller cost note: the deduped batch feeds THREE plan sites (the
    merge join's broadcast build, the key probe's broadcast, and the
    new-key anti join), and Spark re-derives an unexchanged frame per
    site — so a ``changes`` frame computed from an expensive scan is
    recomputed up to three times per execution. The batch is small by
    contract; if deriving it is not cheap, cache or localCheckpoint it
    before calling (the operator does not materialize it internally —
    it cannot know the caller's lifecycle to unpersist safely)."""
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
        effective_date = datetime.date.fromisoformat(effective)
    except (TypeError, ValueError):
        raise ValueError(
            f"scd2_merge: effective must be a YYYY-MM-DD date literal, "
            f"got {effective!r} — a malformed date would NULL out "
            f"valid_from/valid_to under non-ANSI configs"
        ) from None
    # bind the PARSED value, not the raw string: Python >= 3.11
    # fromisoformat also accepts compact ('20240601') and ISO
    # week-date ('2024-W23-1') forms that Spark's string->date cast
    # does not parse — under non-ANSI configs those would cast to
    # NULL, the exact silent corruption this guard exists to stop
    effective = effective_date.isoformat()
    # helper-name collisions REPLACE or ambiguate real data columns
    # (the upsert._check_merge_inputs class of hazard): a dim column
    # named like a __u_ shadow makes the diff read the wrong side
    # via an ambiguous-reference error at best
    helpers = {f"__u_{a}" for a in attrs} | {"__in_upd", "__u_key"}
    for side, df in (("dim", dim), ("changes", changes)):
        clash = sorted(helpers.intersection(df.columns))
        if clash:
            raise ValueError(
                f"scd2_merge: column(s) {clash} in {side} collide with "
                f"the merge's internal helper columns — rename them "
                f"before merging"
            )
    eff = F.lit(effective).cast("date")
    is_cur = F.col("is_current").eqNullSafe(F.lit(True))

    deduped = upsert(
        changes.limit(0), changes, key, ordinal_col=ordinal_col
    )
    # presence marker survives NULL attribute values (a change row may
    # legitimately set an attribute to NULL — NULL-ness of an attr
    # column cannot stand in for "this side matched")
    upd = deduped.select(
        F.col(key).alias("__u_key"),
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.lit(True).alias("__in_upd"),
    )
    # THE one unshuffled pass over the dimension (broadcast left outer
    # — see module docstring for why NOT a full outer). The join is a
    # PURE key equi-join: folding is_current into the join condition
    # keeps the same BroadcastHashJoin node but the residual non-equi
    # predicate is re-evaluated per probe hit outside the hash-lookup
    # fast path — measured 5× slower over a 50M-row dimension. A
    # history row whose key is in the batch therefore MATCHES here;
    # the is_cur gate below makes that match inert (the row keeps its
    # own columns), and the 1:1 fan-out holds because the batch is
    # deduped to one row per key.
    j = dim.join(
        F.broadcast(upd), on=F.col(key) == F.col("__u_key"), how="left"
    )

    in_upd = F.col("__in_upd").isNotNull()
    differs: Column = reduce(
        lambda a, b: a | b,
        [~F.col(a).eqNullSafe(F.col(f"__u_{a}")) for a in attrs],
    )
    changed = is_cur & in_upd & differs  # unmatched rows (untouched
    # keys) have __u_* NULL, so `differs` alone would misfire on them
    # — gate on the marker; history rows (is_current not <=> true) are
    # never "changed" no matter what the batch carries

    def _out(attr_cols, valid_from, valid_to, current) -> Column:
        return F.struct(
            F.col(key).alias(key),
            *[c.alias(a) for a, c in zip(attrs, attr_cols)],
            valid_from.alias("valid_from"),
            valid_to.alias("valid_to"),
            current.alias("is_current"),
        )

    keep = _out(  # the row itself: history, untouched, or no-op resend
        [F.col(a) for a in attrs],
        F.col("valid_from"), F.col("valid_to"), F.col("is_current"),
    )
    closed = _out(
        [F.col(a) for a in attrs],
        F.col("valid_from"), eff, F.lit(False),
    )
    opened = _out(
        [F.col(f"__u_{a}") for a in attrs],
        eff, F.lit(None).cast("date"), F.lit(True),
    )
    # each joined row explodes into its 1–2 output rows IN the same
    # pass: selecting the outcomes as separate union branches instead
    # (the r11 form) re-executed this join once per branch — four
    # dimension scans for the claimed one (module docstring)
    merged = j.select(
        F.explode(
            F.when(changed, F.array(closed, opened)).otherwise(
                F.array(keep)
            )
        ).alias("__r")
    ).select("__r.*")

    # brand-new keys: probe the dimension's KEY COLUMN ONLY (a pruned
    # second scan — ReadSchema (key, is_current)) for keys the batch
    # matched, then anti-join the batch against that ≤|batch|-row set
    # — both joins broadcast the small side, the dimension is never
    # exchanged
    matched_keys = (
        dim.where(is_cur)
        .select(key)
        .join(F.broadcast(deduped.select(key)), on=key, how="semi")
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
    return merged.unionByName(opened_new)
