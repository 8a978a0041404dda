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
    strings produce NULL, not errors — via explicit ``try_cast``, NOT
    plain cast: under ANSI mode (the Spark 4 default, and this
    engine's) ``'ab'.cast('int')`` is a job-killing CAST_INVALID_INPUT,
    so one bad API time string would fail the whole query instead of
    NULLing one row."""
    parts = F.split(col, ":")
    return (
        parts.getItem(0).try_cast("int") * 3600
        + parts.getItem(1).try_cast("int") * 60
        + parts.getItem(2).try_cast("int")
    ).alias("seconds_of_day")


def seconds_to_time(col: Column) -> Column:
    """Seconds since midnight → 'HH:mm:ss' string. Inputs outside the
    time-of-day domain [0, 86400) yield NULL — ``lpad(str, 2)`` (the
    old form) TRUNCATES strings longer than 2, so a 100-hour input
    rendered as a plausible-looking '10:00:00' and negatives produced
    '-1:-1:…' garbage; there is no correct 'HH:mm:ss' for either.
    NULL in → NULL out (the unmatched ``when``)."""
    c = col.cast("long")
    formatted = F.format_string(
        "%02d:%02d:%02d",
        F.floor(c / 3600).cast("int"),
        F.floor((c % 3600) / 60).cast("int"),
        (c % 60).cast("int"),
    )
    return F.when((c >= 0) & (c < 86400), formatted)


def time_of_day(ts: Column) -> Column:
    """Timestamp → canonical 'HH:mm:ss' time-of-day string."""
    return F.date_format(ts, "HH:mm:ss")
