"""Arbitrary stateful streaming on the transformWithState API (Spark
4's successor to ``applyInPandasWithState``): typed state variables,
explicit processor lifecycle, RocksDB-backed state.

Same semantics as ``sessions.running_user_totals`` — cumulative
per-user event count + value sum — so the equivalence test can pin
OLD API == NEW API == batch aggregate. Scale shape: state is one tiny
value per user in the RocksDB store (incremental checkpoints, spill to
disk — the store survives state larger than executor memory, which the
HDFS-backed map used by the v1 API does not).

EXPERIMENTAL — verification status (be explicit, SCALE.md §state-v2):
the transformWithState driver worker needs ``google.protobuf`` (the
state-server wire protocol), absent in this container, so the
END-TO-END path (wire protocol + RocksDB store) has NEVER executed in
this environment; the ``@realdeps`` equivalence test runs wherever
protobuf exists. What IS verified here: ``RunningTotalsProcessor``'s
state arithmetic runs in-process against a stub state handle and is
pinned equal to the v1 operator and the batch aggregate
(tests/test_streaming.py::test_state_v2_processor_logic_matches_v1).
We deliberately do NOT vendor a protobuf shim: a fake
``google.protobuf`` package could shadow the real one in a production
environment and corrupt the wire bytes silently — a skipped test is
honest, a plausible-but-wrong state server is not. The v1
``applyInPandasWithState`` operator remains the always-runnable path
and is equivalence-tested everywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from pyspark.sql.streaming.stateful_processor import StatefulProcessor

RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"


class RunningTotalsProcessor(StatefulProcessor):
    """StatefulProcessor maintaining (count, sum) per user key."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", "n BIGINT, total DOUBLE")

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timer_values):
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, round(total, 6)))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "total_value": round(total, 6)}]
        )

    def close(self) -> None:
        pass


def running_user_totals_v2(events: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` form of the running-totals
    operator. Requires the RocksDB state store provider (the session
    conf is runtime-settable; set before starting the stream)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=RUNNING_TOTALS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def enable_rocksdb_state(spark) -> None:
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
