"""Deterministic in-process API emulators for the REST data source.

These stand in for the live Jira/Tempo endpoints (no HTTP stack in
this environment) and mirror the offset-page response shape the
reference consumes (``issue_processor.py:141,153,164``):
``{"startAt": N, "maxResults": M, "total": T, "issues": [...]}``.

Records are derived deterministically from (offset, params) so tests
can assert exact results, including server-side filtering — the
behavior the reference delegates via API query params
(``fetch_jira_tempo_worklogs.py:60-63``).
"""

from __future__ import annotations

TOTAL = 137
STRIDE = 25
PRIORITIES = ("high", "low")


def _record(i: int) -> dict:
    return {
        "id": str(i),
        "self": f"https://api/issue/{i}",
        "key": f"PROJ-{i}",
        "priority": PRIORITIES[i % 2],
        "project_id": str(100 + i % 3),
    }


def synthetic_issues_fetcher(options: dict):
    """Factory: (options) -> fetcher(url, params) for a synthetic
    offset-paginated issues endpoint with server-side equality filters
    on ``priority`` and ``project_id``."""

    def fetch(url: str, params: dict | None = None) -> dict:
        params = params or {}
        start = int(params.get("startAt", 0))
        records = [_record(i) for i in range(TOTAL)]
        # server-side filter delegation (predicate pushdown target)
        for col in ("priority", "project_id"):
            if col in params:
                records = [r for r in records if r[col] == params[col]]
        page = records[start : start + STRIDE]
        return {
            "startAt": start,
            "maxResults": STRIDE,
            "total": len(records),
            "issues": page,
        }

    return fetch
