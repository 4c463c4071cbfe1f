"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.10/§2.11 — the escape hatch when built-in windows can't express
the state machine; named in the 100 TB mandate for custom stateful ops).

Example operator: per-user running activity profile — event count, value sum,
and last-seen timestamp maintained across micro-batches, emitting one updated
row per user per batch. This is the shape of online feature maintenance
(user embeddings, rate counters, fraud scores) that tumbling/session windows
can't express because state never closes.

Scale notes: state lives in the state store, partitioned by the grouping
key — the operator shuffles each micro-batch once on user_id and touches
only keys present in the batch. Pandas batches bound memory per key group.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, last_ts timestamp"
)
STATE_SCHEMA = "n long, s double, last long"


def _update_user_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, s, last_us = state.get
    else:
        n, s, last_us = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        batch_max_us = int(pdf["ts"].astype("int64").max()) // 1000
        last_us = max(last_us, batch_max_us)
    state.update((n, s, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [s],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def user_profile_stream(events_stream: DataFrame) -> DataFrame:
    """Attach the stateful profile operator to a streaming events frame with
    columns (user_id long, ts timestamp, value double)."""
    # output mode "append": each emitted row is a final per-batch snapshot
    # (keyed by user + n_events), compatible with append-only file sinks;
    # "update" would restrict the query to update-capable sinks.
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
