"""Driver-contract guards: __spark_entry__ exports stay consistent."""

from __future__ import annotations

import importlib
import inspect
import os
import sys


def test_entry_module_contract():
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    e = importlib.import_module("__spark_entry__")
    qs, oracles = e.queries(), e.oracle_sql()
    # every oracle belongs to a registered query
    assert set(oracles) <= set(qs), sorted(set(oracles) - set(qs))
    # names are stable identifiers (artifact keys, file names)
    for name in qs:
        assert name.isidentifier(), name
    # every query callable takes (spark, sf_dir)
    for name, fn in qs.items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, (name, params)
    # oracles are non-empty SQL strings
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
    assert callable(e.entry)
