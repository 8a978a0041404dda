"""Upsert-able parquet table: window-dedup MERGE + atomic directory swap.

The reference's sink is a per-row ``INSERT ... ON CONFLICT DO UPDATE``
(``/root/reference/dags/jira/db_ops.py:29-43``). Plain parquet has no
transactional MERGE, so the engine-level equivalent (SURVEY.md §4.2-2)
is: read base ∪ apply updates via the distributed upsert operator →
write to a fresh generation directory → atomically flip a pointer file.
Readers resolve the pointer first, so they always see a complete
generation — the parquet-native stand-in for a Delta/Iceberg commit.
Replay-safe: re-applying a batch produces an identical generation
(last-writer-wins), which is the reference's idempotency invariant
(SURVEY.md §3.4).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from airflow_jira_etl_spark.operators.upsert import upsert

_POINTER = "_CURRENT"


class ParquetUpsertTable:
    """A directory-backed table supporting idempotent keyed upsert."""

    def __init__(self, spark: SparkSession, root: str, key: str | list[str]):
        self.spark = spark
        self.root = root
        self.key = key
        os.makedirs(root, exist_ok=True)

    def _pointer_path(self) -> str:
        return os.path.join(self.root, _POINTER)

    def current_generation(self) -> str | None:
        try:
            with open(self._pointer_path()) as f:
                gen = f.read().strip()
            return os.path.join(self.root, gen) if gen else None
        except FileNotFoundError:
            return None

    def read(self) -> DataFrame | None:
        gen = self.current_generation()
        if gen is None:
            return None
        return self.spark.read.parquet(gen)

    def apply(self, updates: DataFrame) -> None:
        """MERGE a batch of updates (last-writer-wins on the key)."""
        base = self.read()
        merged = updates if base is None else upsert(base, updates, self.key)
        cur = self.current_generation()
        cur_n = int(os.path.basename(cur).split("_")[1]) if cur else -1
        new_gen = f"gen_{cur_n + 1:06d}"
        out = os.path.join(self.root, new_gen)
        shutil.rmtree(out, ignore_errors=True)
        merged.write.mode("overwrite").parquet(out)
        # atomic pointer flip: write-then-rename on the same filesystem
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(new_gen)
        os.replace(tmp, self._pointer_path())
        # old generations are kept for readers mid-scan; GC is a
        # separate concern (time-based retention, as in Delta VACUUM)

    def destroy(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
