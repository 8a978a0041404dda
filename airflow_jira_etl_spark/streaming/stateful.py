"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for stream semantics the built-in windowed/session
aggregates can't express: arbitrary per-key state carried across
micro-batches. Here: a per-user running profile (event count, total
value, peak value) updated batch-by-batch — the streaming analog of
the reference's resume-where-you-left-off scan state
(``worklog_processor.py:106`` keeps the cursor on ``self``; SURVEY.md
§3.4), but keyed, distributed, and checkpoint-recoverable.

State lives in Spark's state store (one shard per shuffle partition):
at scale, state volume is bounded by |keys|, not stream length, and
recovery replays from the checkpoint — properties the reference's
in-object cursor does not have.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, peak_value double"
)
STATE_SCHEMA = "n long, n_vals long, total double, peak double"


def _update_profile(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # SQL aggregate semantics on NULLs: sum/max SKIP them, and a user
    # whose values are ALL null yields NULL, not 0.0 / a -inf sentinel
    # (Spark nulls arrive in pandas as NaN; a naive .sum() over
    # all-NaN returns 0.0 and max(-inf, nan) keeps -inf — both would
    # leak into the output where the SQL oracle says NULL). n_vals
    # counts non-null values seen so far so "any value yet?" survives
    # checkpoint recovery; n counts ROWS (count(*) semantics).
    (user_id,) = key
    n, n_vals, total, peak = (
        state.get if state.exists else (0, 0, 0.0, 0.0)
    )
    for pdf in batches:
        n += len(pdf)
        vals = pdf["value"].dropna()
        if len(vals):
            mx = float(vals.max())
            peak = mx if n_vals == 0 else max(peak, mx)
            total += float(vals.sum())
            n_vals += len(vals)
    state.update((n, n_vals, total, peak))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total if n_vals else None],
            "peak_value": [peak if n_vals else None],
        }
    )


def running_user_profile(events_stream: DataFrame) -> DataFrame:
    """Per-user running profile over a micro-batched event stream.
    Emits the updated running totals for each user touched by each
    micro-batch (update-style output). ``n_events`` strictly increases
    across a user's emissions, so consumers reduce to final state with
    ``max_by(col, n_events)`` — no monotonicity assumption on the value
    columns themselves."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
