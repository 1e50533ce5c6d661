"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user event counter with a high-value alert flag — the shape
of any custom stateful op (fraud scoring, session enrichment, dedup
windows): grouped state keyed by user, Arrow-batched updates, timeout
handling. State is O(all keys ever seen) by default — the exact
RUNNING-total semantics the hash-checked query needs — and O(active
keys) when ``idle_timeout_ms`` opts into processing-time eviction
(idle users' state is dropped; a re-appearing user restarts from zero —
the right trade for alerting-style ops on unbounded key spaces, wrong
for exact lifetime totals)."""

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


def _accumulate(prior: tuple, pdfs) -> tuple:
    """The ONE accumulate rule all three stateful variants share
    (round-12 review: three hand-synced copies of this body risked the
    gate-tested eviction path and the TWS twin silently diverging from
    the hash-checked default path)."""
    n, v = prior
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].sum())
    return n, v


def _emit(key, n: int, v: float):
    """The ONE emit/alert rule (alert threshold lives here only)."""
    import pandas as pd

    return pd.DataFrame(
        {"user_id": [key[0]], "n_events_total": [n], "value_total": [v],
         "alert": [v > 1000.0]}
    )


def _update(key, pdfs, state: GroupState):
    n, v = _accumulate(state.get if state.exists else (0, 0.0), pdfs)
    state.update((n, v))
    yield _emit(key, n, v)


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Stateful per-user running totals over a stream of events.

    Default: exact lifetime totals (state never evicted — unbounded key
    spaces grow the store; that is inherent to the semantics, not a
    leak). ``idle_timeout_ms`` bounds the store to ACTIVE keys instead:
    a user idle past the timeout has their state removed (emitting
    nothing — the last emitted total stands in the sink), and restarts
    from zero on reappearance.

    ENVIRONMENT GATE (same class as the TWS twin below): in this
    sandbox, aIPWS + ProcessingTimeTimeout wedges an availableNow drain
    at the second micro-batch's state-store commit regardless of the
    timeout value (measured at 1 h and 0.5 s — not a timer artifact);
    the eviction path is therefore gate-tested
    (tests/test_scale_utils.py::test_stateful_running_totals_idle_timeout_path)
    and the hash-checked driver query uses the default exact path."""
    if idle_timeout_ms is None:
        return (
            events.groupBy("user_id")
            .applyInPandasWithState(
                _update, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout,
            )
        )

    def _update_evicting(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, v = _accumulate(state.get if state.exists else (0, 0.0), pdfs)
        state.update((n, v))
        state.setTimeoutDuration(idle_timeout_ms)
        yield _emit(key, n, v)

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_evicting, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
            GroupStateTimeout.ProcessingTimeTimeout,
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
            prior = (self._totals.get() if self._totals.exists()
                     else (0, 0.0))
            n, v = _accumulate(prior, rows)
            self._totals.update((n, v))
            yield _emit(key, n, v)

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
