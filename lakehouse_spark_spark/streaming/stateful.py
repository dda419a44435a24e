"""Custom stateful streaming operator: per-user session aggregation via
``applyInPandasWithState``.

The built-in windowed aggregations (streaming/events.py) cover
fixed-window semantics; gap-based sessions need CUSTOM state — the
session boundary depends on the previous event, which Spark's built-in
session_window covers only for simple aggregates. This operator keeps
one state row per user (open session: start, last ts, count, sum) and:

- folds each micro-batch's events (Arrow batches, sorted by ts) into
  the open session,
- EMITS a session row whenever a gap closes it (and for the still-open
  session it emits the current snapshot — the session's latest state,
  replaced by a newer snapshot if the session extends in a later batch;
  consumers take the last row per (user_id, session_start_us)),
- uses processing-time timeout as the production close-out path.

Scale notes: state is one tiny row per active user, sharded by the
group key across executors; the shuffle is the same hash-partition as a
batch groupBy. Timeouts bound state growth for churned users.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

# state: open-session accumulator per user
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)

GAP_US = 30 * 60 * 1_000_000


def _sessionize_user(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n, s = state.get
        state.remove()
        yield pd.DataFrame(
            [[user_id, start, last, n, s, True]], columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields]
        )
        return
    rows = pd.concat(list(pdfs)).sort_values("ts_us")
    out = []
    cur = list(state.get) if state.exists else None  # [start, last, n, sum]
    for ts, value in zip(rows["ts_us"], rows["value"]):
        ts = int(ts)
        if cur is None:
            cur = [ts, ts, 0, 0.0]
        elif ts - cur[1] > GAP_US:
            out.append([user_id, cur[0], cur[1], cur[2], cur[3], True])
            cur = [ts, ts, 0, 0.0]
        cur[1] = ts
        cur[2] += 1
        cur[3] += float(value)
    state.update(tuple(cur))
    try:
        state.setTimeoutDuration(60 * 60 * 1000)  # close out after 1h idle
    except Exception:
        pass  # NoTimeout mode (availableNow drains)
    out.append([user_id, cur[0], cur[1], cur[2], cur[3], False])  # open-session snapshot
    yield pd.DataFrame(out, columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields])


def stateful_sessions(events: DataFrame, idle_timeout: bool = False) -> DataFrame:
    """events stream (with ts TimestampType + value) → session rows.
    Works on any streaming DataFrame with user_id/ts/value.

    ``idle_timeout=True`` enables the processing-time close-out for
    continuous deployments; leave False for availableNow catch-up
    drains — with a timeout registered, the availableNow trigger keeps
    scheduling state-cleanup batches until the wall-clock timeout fires
    (observed: the drain never terminates)."""
    prepared = events.select(F.col("user_id"), F.unix_micros("ts").alias("ts_us"), F.col("value"))
    timeout = GroupStateTimeout.ProcessingTimeTimeout if idle_timeout else GroupStateTimeout.NoTimeout
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_user,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


# --- Spark 4 transformWithState (TWS) twin -------------------------------
# The arbitrary-state API that replaces applyInPandasWithState going
# forward: typed state handles (ValueState/ListState/MapState), native
# TTL, timers, and initial-state bootstrap — all backed by the RocksDB
# state store. The operator below is the minimal production shape:
# per-key running totals in a ValueState, emitting the refreshed totals
# every time the key appears in a micro-batch (Update mode).
#
# ENVIRONMENT SEAM (same class as Delta — see SCALE.md): PySpark's TWS
# state client speaks protobuf to the JVM state server
# (pyspark/sql/streaming/proto/StateMessage_pb2.py imports
# google.protobuf), and `protobuf` is not installed in this sandbox
# (no network egress to install it) — the TWS driver worker crashes at
# startup ("TransformWithStateInPySpark driver worker exited
# unexpectedly"). The code below is the correct API usage, verified up
# to that boundary; tests/test_tws_streaming.py runs it end-to-end
# wherever protobuf exists and SKIPs here. applyInPandasWithState
# (above) remains the fully-tested stateful path in this environment.

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

TWS_OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, sum_cents BIGINT"


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running (count, integer-cents sum) — exact under any
    batch split because the state is integers (no float accumulation
    drift between the streaming and batch twins)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n BIGINT, s BIGINT")

    def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
        n, s = 0, 0
        for pdf in rows:
            n += len(pdf)
            s += int(pdf["cents"].sum())
        prev = self._totals.get()
        if prev is not None:
            n += int(prev[0])
            s += int(prev[1])
        self._totals.update((n, s))
        yield pd.DataFrame({"user_id": [int(key[0])], "n_events": [n], "sum_cents": [s]})

    def close(self) -> None:
        pass


def tws_running_totals(events: DataFrame) -> DataFrame:
    """events stream → per-user running totals via transformWithState.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) — TWS is RocksDB-only.
    State: one (long, long) per user, hash-sharded like a batch
    groupBy; Update output mode emits a refreshed row per touched key
    per micro-batch, so downstream consumers keep the LAST row per key.
    """
    prepared = events.select(
        F.col("user_id"), F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        RunningTotalsProcessor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
