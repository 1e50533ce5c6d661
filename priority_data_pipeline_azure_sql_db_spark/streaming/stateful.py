"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user event counter with a high-value alert flag — the shape
of any custom stateful op (fraud scoring, session enrichment, dedup
windows): grouped state keyed by user, Arrow-batched updates, timeout
handling. State is O(active keys), bounded by the processing-time
timeout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events_total", T.LongType()),
    T.StructField("value_total", T.DoubleType()),
    T.StructField("alert", T.BooleanType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("v", T.DoubleType()),
])


def _update(key, pdfs, state: GroupState):
    import pandas as pd

    n, v = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events_total": [n], "value_total": [v],
         "alert": [v > 1000.0]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful per-user running totals over a stream of events."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same running totals on the transformWithStateInPandas API
    (Spark 4.x, SPARK-49564): the successor to applyInPandasWithState —
    named state variables on a handle (ValueState here; List/MapState,
    per-key timers, and state TTL exist on the same handle), so new
    state/timers can be added without re-plumbing the whole function
    signature.

    ENVIRONMENT GATE: the TWS Python driver worker imports
    google.protobuf at stream start; this sandbox ships a broken
    protobuf, so the operator crashes here with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE. It is therefore
    implemented + skipif-tested (tests/test_scale_utils.py) but not
    registered with the driver; also requires the RocksDB state store
    provider (spark.sql.streaming.stateStore.providerClass).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            prior = self._totals.get() if self._totals.exists() else (0, 0.0)
            n, v = prior
            for pdf in rows:
                n += len(pdf)
                v += float(pdf["value"].sum())
            self._totals.update((n, v))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events_total": [n],
                 "value_total": [v], "alert": [v > 1000.0]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
