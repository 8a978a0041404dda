"""A/B: applyInPandasWithState (current stream_stateful_profile kernel)
vs transformWithStateInPandas (Spark 4.x) over the same 4-page stream.

VERDICT r15 item 3 asked for this measurement: the applyInPandasWithState
serializer costs ~0.3-0.5 ms per (key, batch) in pyspark internals
(state JSON + 1-row state pdf + per-group concat), and
transformWithStateInPandas has a different state transport
(ListState/ValueState over a long-lived handle). Caveats that shape the
result: transformWithState REQUIRES the RocksDB state store provider
(the heap provider is unsupported), so its floor includes RocksDB's
per-batch snapshot/commit cost that the default heap store does not pay.

Usage::

    python -m airflow_jira_etl_spark.tools.tws_probe [sf_dir] [runs]

Prints wall seconds per variant per run (first run absorbs page
staging + codegen; compare MINs).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

from pyspark.sql import functions as F

from airflow_jira_etl_spark import catalog
from airflow_jira_etl_spark.scratch import session_scratch
from airflow_jira_etl_spark.session import get_spark
from airflow_jira_etl_spark.streaming.source import (
    pages_dir_for,
    py_stateful_state_partitions,
    write_event_pages,
)
from airflow_jira_etl_spark.streaming.stateful import (
    OUTPUT_SCHEMA,
    running_user_profile,
)

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def _tws_profile(stream):
    """transformWithStateInPandas twin of running_user_profile: same
    per-user (n, n_vals, total, peak) running state, same NULL/NaN
    conventions (value_is_null marker; skipna=False semantics)."""
    import math

    import pandas as pd
    import numpy as np
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Profile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "profile", "n long, n_vals long, total double, peak double"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            st = self._state.get() if self._state.exists() else None
            n, n_vals, total, peak = st if st else (0, 0, 0.0, 0.0)
            for pdf in rows:
                n += len(pdf)
                v = pdf["value"].to_numpy()
                vals = v[~pdf["value_is_null"].to_numpy()]
                if len(vals):
                    mx = float(np.max(vals))
                    if n_vals == 0:
                        peak = mx
                    elif math.isnan(mx) or math.isnan(peak):
                        peak = float("nan")
                    else:
                        peak = max(peak, mx)
                    total += float(np.sum(vals))
                    n_vals += len(vals)
            self._state.update((n, n_vals, total, peak))
            if n_vals:
                yield pd.DataFrame(
                    {
                        "user_id": (
                            [user_id]
                            if user_id is None
                            or (
                                isinstance(user_id, float)
                                and user_id != user_id
                            )
                            else np.array([user_id], dtype="int64")
                        ),
                        "n_events": np.array([n], dtype="int64"),
                        "total_value": np.array([total], dtype="float64"),
                        "peak_value": np.array([peak], dtype="float64"),
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "n_events": [n],
                        "total_value": [None],
                        "peak_value": [None],
                    }
                )

        def close(self) -> None:
            pass

    return (
        stream.select(
            "user_id",
            "value",
            F.col("value").isNull().alias("value_is_null"),
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            Profile(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark("tws-probe")
    from airflow_jira_etl_spark.queries.streaming_queries import SCRATCH

    pages = pages_dir_for(SCRATCH, sf_dir)
    write_event_pages(spark, sf_dir, pages, n_pages=4)
    ck_root = session_scratch("checkpoints", "tws_probe")
    shards = py_stateful_state_partitions(spark)

    def stream_df():
        return (
            spark.readStream.schema(catalog.SCHEMAS["events"])
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(pages, "page_*"))
        )

    def run(name: str, mk, i: int, rocksdb: bool) -> float:
        ck = os.path.join(ck_root, f"{name}_{i}")
        shutil.rmtree(ck, ignore_errors=True)
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", shards)
        old_prov = spark.conf.get(_PROVIDER_KEY, None)
        if rocksdb:
            spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
        try:
            t0 = time.perf_counter()
            q = (
                mk(stream_df())
                .writeStream.outputMode("update")
                .format("memory")
                .queryName(f"{name}_{i}")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.perf_counter() - t0
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
            if rocksdb:
                if old_prov:
                    spark.conf.set(_PROVIDER_KEY, old_prov)
                else:
                    spark.conf.unset(_PROVIDER_KEY)
        n = spark.table(f"{name}_{i}").count()
        spark.catalog.dropTempView(f"{name}_{i}")
        shutil.rmtree(ck, ignore_errors=True)
        print(f"{name} run{i}: {wall:.2f}s rows={n}", flush=True)
        return wall

    for i in range(runs):
        run("apws_heap", running_user_profile, i, rocksdb=False)
        run("apws_rocksdb", running_user_profile, i, rocksdb=True)
        if os.environ.get("SPARK_GRAFT_TWS") == "1":
            run("tws_rocksdb", _tws_profile, i, rocksdb=True)


if __name__ == "__main__":
    main()
