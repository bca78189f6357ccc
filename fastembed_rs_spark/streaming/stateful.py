"""Custom stateful streaming operators via ``applyInPandasWithState``.

Beyond what watermarked windows / session_window express declaratively:
arbitrary per-key state machines. The canonical training-pipeline example
here is ``running_user_stats`` — per-user cumulative counters that survive
across micro-batches (the streaming analogue of a grouped aggregate whose
state never closes).

Scale shape: state lives in the state store keyed by the group column —
uniform user ids → no hot partitions; a GroupStateTimeout evicts idle keys
so state stays bounded on unbounded key spaces.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])


def _update_user_stats(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_stats(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Per-user running (count, value sum) maintained across micro-batches —
    an ``applyInPandasWithState`` stateful operator. Emits one updated row
    per user per micro-batch; pair with output mode ``update``.

    No timeout here (counters never expire); swap
    ``GroupStateTimeout.NoTimeout`` for ``ProcessingTimeTimeout`` + a
    ``state.setTimeoutDuration`` call to bound state on open-ended key
    spaces."""
    return events.groupBy(user_col).applyInPandasWithState(
        _update_user_stats,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
