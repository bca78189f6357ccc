"""Stream-stream interval join: click→view attribution.

The one Structured Streaming join form the other modules don't cover:
both sides are unbounded streams, joined on key + event-time range. Spark
buffers each side in the state store and uses the watermark plus the
time-range predicate to compute how long a buffered row can still match,
so state is bounded by (watermark + interval), not by stream length —
the property that makes this runnable forever at 100 TB/day.

The reference has no streaming at all (`README.md:9` — "No dependency on
Tokio"); this mirrors the batch `events_asof_join` / `events_range_join`
semantics (operators/asof.py) in continuous form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    static dimension DataFrame (broadcast when small — same planning as
    batch). No state store involvement: the static side is re-resolvable
    per batch, so dimension updates between batches are picked up for
    file-based sources. The third join form next to batch joins
    (queries/ catalog) and the stream-stream interval join below."""
    renamed = dim.withColumnRenamed(dim_key, "__dk")
    return stream.join(
        renamed, stream[stream_key] == F.col("__dk"), how
    ).drop("__dk")


def view_click_attribution(
    views: DataFrame,
    clicks: DataFrame,
    max_delay: str = "15 minutes",
    watermark: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Attribute every click to all of the same user's views in the
    preceding ``max_delay`` window (inclusive bounds on both ends).

    Both inputs must be streaming DataFrames with an event-time ``ts_col``.
    Inner interval joins support append output; rows emit once the
    watermark passes the end of their possible-match window. All column
    names are parameters so any schema can be attributed without renaming
    upstream.

    Schema note: ``lag_s`` is DOUBLE (fractional seconds at microsecond
    precision) as of round 4 — earlier versions emitted whole-second
    BIGINT. Sinks written by the old version need a one-time cast/rewrite
    before appending, and a checkpointed query should not be upgraded
    mid-stream across this change.
    """
    v = views.withWatermark(ts_col, watermark).select(
        F.col(user_col).alias("v_user"),
        F.col(event_id_col).alias("view_event_id"),
        F.col(ts_col).alias("view_ts"),
    )
    c = clicks.withWatermark(ts_col, watermark).select(
        F.col(user_col).alias("user_id"),
        F.col(event_id_col).alias("click_event_id"),
        F.col(ts_col).alias("click_ts"),
        F.col(value_col).alias("click_value"),
    )
    cond = (
        (c.user_id == v.v_user)
        & (v.view_ts <= c.click_ts)
        & (v.view_ts >= c.click_ts - F.expr(f"INTERVAL {max_delay}"))
    )
    return c.join(v, cond, "inner").select(
        "user_id", "click_event_id", "click_ts", "view_event_id", "view_ts",
        "click_value",
        # attribution lag in fractional seconds — timestamp difference at
        # microsecond precision (unix_timestamp would truncate sub-second
        # lags to whole seconds)
        (
            (F.unix_micros("click_ts") - F.unix_micros("view_ts"))
            / F.lit(1_000_000.0)
        ).alias("lag_s"),
    )
