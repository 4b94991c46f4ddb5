"""Arbitrary stateful streaming via the Spark 4 transformWithState API.

`streaming.events.stateful_user_profiles` uses the older
``applyInPandasWithState`` (GroupState); this module is its successor-API
twin: ``transformWithStateInPandas`` with a ``StatefulProcessor`` owning
typed state handles — the API Spark 4 positions for new custom stateful
operators (composable state variables, timers, TTL, state-v2 RocksDB
backend). Requires the RocksDB state store provider::

    spark.sql.streaming.stateStore.providerClass =
        org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider

State here is one ValueState holding the running (event_count, value_sum)
per user — O(distinct users), checkpoint-durable: totals keep
accumulating across query restarts, which is what the test pins.

Environment seam: the TWS Python state client talks protobuf to the JVM
state server (``pyspark.sql.streaming.proto``); this container has no
``google.protobuf``, so the end-to-end test is import-gated (same policy
as the PIL/transformers seams). The module itself imports and builds the
plan without protobuf — only query START needs it — and the live-tested
in-sandbox twin is ``streaming.events.stateful_user_profiles``
(applyInPandasWithState).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)


class RunningUserTotals(StatefulProcessor):
    """Per-user running event count + value sum (ValueState)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n = 0
        v = 0.0
        for pdf in rows:
            n += len(pdf)
            v += float(pdf["value"].fillna(0.0).sum())
        if self._totals.exists():
            prev_n, prev_v = self._totals.get()
            n += int(prev_n)
            v += float(prev_v)
        self._totals.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "value_sum": [v]}
        )

    def close(self) -> None:
        pass


def user_running_totals_stream(events_stream: DataFrame) -> DataFrame:
    """events stream → per-user running totals, emitted on every update
    (Update output mode; state survives restarts via the checkpoint)."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningUserTotals(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
