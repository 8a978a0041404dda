"""TIME-of-day discipline (SURVEY.md §1.3 / §4.2-4).

The reference's worklogs DDL declares a SQL ``TIME`` column
(``start_time``, ``/root/reference/dags/fetch_jira_tempo_worklogs.py:87``);
Spark has no TIME type. Engine convention: the canonical carrier is the
``'HH:mm:ss'`` string exactly as the API delivers it, with helpers to
move between that form and integer seconds-since-midnight (the form
arithmetic and range predicates want). Both directions are pure
codegen expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def time_to_seconds(col: Column) -> Column:
    """'HH:mm:ss' → seconds since midnight (int). NULL-safe: malformed
    strings produce NULL, not errors (split yields non-numeric parts →
    try_cast semantics via nullable casts)."""
    parts = F.split(col, ":")
    return (
        parts.getItem(0).cast("int") * 3600
        + parts.getItem(1).cast("int") * 60
        + parts.getItem(2).cast("int")
    ).alias("seconds_of_day")


def seconds_to_time(col: Column) -> Column:
    """Seconds since midnight → 'HH:mm:ss' string."""
    h = F.floor(col / 3600).cast("int")
    m = F.floor((col % 3600) / 60).cast("int")
    s = (col % 60).cast("int")
    return F.concat_ws(
        ":",
        F.lpad(h.cast("string"), 2, "0"),
        F.lpad(m.cast("string"), 2, "0"),
        F.lpad(s.cast("string"), 2, "0"),
    )


def time_of_day(ts: Column) -> Column:
    """Timestamp → canonical 'HH:mm:ss' time-of-day string."""
    return F.date_format(ts, "HH:mm:ss")
