"""Property test: the compiled MAPPING plan agrees with an independent
row-at-a-time interpreter of the reference's flatten semantics
(``jira_base_processor.py:65-106``) on randomized records × mappings.

The interpreter below is written fresh from the documented semantics
(SURVEY.md §2A/A5): mapped keys kept+renamed, nested dicts recurse with
raw-parent-key prefixes, lists '//'-joined, unmapped dropped, missing
-> absent (NULL in the columnar output).

Type discipline: a JSON path's type must be consistent across records
(columnar world); leaves mapped to the name 'arr' carry string lists,
all other leaves carry scalar strings.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from airflow_jira_etl_spark.operators.mapping import compile_mapping, mapping_to_schema

keys = st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon"])
leaf_names = st.sampled_from(["x", "y", "z", "arr"])

LIST_LEAF = "arr"


def mappings(depth: int = 2):
    if depth == 0:
        return st.dictionaries(keys, leaf_names, min_size=1, max_size=3)
    return st.dictionaries(
        keys,
        st.one_of(leaf_names, st.deferred(lambda: mappings(depth - 1))),
        min_size=1,
        max_size=3,
    )


def records_for(mapping: dict):
    """Records shaped like the mapping: keys optionally absent, extra
    unmapped keys present, list values exactly at LIST_LEAF leaves."""

    def strat(m: dict):
        fields = {}
        for k, v in m.items():
            if isinstance(v, dict):
                fields[k] = strat(v)
            elif v == LIST_LEAF:
                fields[k] = st.lists(st.text(alphabet="xy", max_size=2), max_size=3)
            else:
                fields[k] = st.text(alphabet="abc", max_size=4)
        fields["__unmapped__"] = st.text(max_size=3)
        return st.fixed_dictionaries({}, optional=fields)

    return strat(mapping)


def interpret(record: dict, mapping: dict, parent: str = "") -> dict:
    """Independent reimplementation of the documented flatten rules."""
    out: dict = {}
    for key, value in record.items():
        mapped = mapping.get(key)
        if not mapped:
            continue
        if isinstance(mapped, dict) and isinstance(value, dict):
            out.update(interpret(value, mapped, f"{parent}_{key}" if parent else key))
        elif isinstance(value, list):
            name = f"{parent}_{mapped}" if parent else mapped
            out[name] = "//".join(map(str, value))
        elif isinstance(mapped, str):
            name = f"{parent}_{mapped}" if parent else mapped
            out[name] = value
    return out


def leaf_info(mapping: dict, parent: str = "") -> list[tuple[str, bool]]:
    """(flat column name, is_list) per leaf, in mapping order."""
    out = []
    for key, mapped in mapping.items():
        if isinstance(mapped, dict):
            out.extend(leaf_info(mapped, f"{parent}_{key}" if parent else key))
        else:
            out.append(
                (f"{parent}_{mapped}" if parent else mapped, mapped == LIST_LEAF)
            )
    return out


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_compiled_flatten_matches_interpreter(spark, data):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    mapping = data.draw(mappings())
    info = leaf_info(mapping)
    cols = [c for c, _ in info]
    if len(set(cols)) != len(cols):
        # leaf-name collisions are a mapping-authoring error (the
        # reference would silently overwrite dict keys) — out of scope
        return
    records = data.draw(st.lists(records_for(mapping), min_size=1, max_size=4))

    leaf_types = {
        c: T.ArrayType(T.StringType()) for c, is_list in info if is_list
    }
    schema = mapping_to_schema(mapping, leaf_types)
    raw = spark.createDataFrame([(json.dumps(r),) for r in records], "raw string")
    parsed = raw.select(F.from_json("raw", schema).alias("r")).select("r.*")
    flat = parsed.select(*compile_mapping(mapping, schema))

    assert flat.columns == cols
    for rec, row in zip(records, (r.asDict() for r in flat.collect())):
        exp = interpret(rec, mapping)
        for col, is_list in info:
            expected = exp.get(col)
            if is_list and expected is None and _path_present(rec, mapping, col):
                # empty list joins to '' — interpreter emits '' too
                expected = exp.get(col)
            assert row.get(col) == expected, (col, rec, mapping)


def _path_present(rec, mapping, flat_col):
    return flat_col in interpret(rec, mapping)
