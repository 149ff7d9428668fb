"""Stream-stream interval join (ST family, beyond-reference).

The batch face is plans/events.range_join_incidents (bin-bucketed
equi-join rewrite). In Structured Streaming the SAME semantics run as
a native stream-stream inner join with a time-interval condition:
Spark keeps both sides in the state store and uses the watermarks
plus the range predicate to expire state — the interval side's row
can stop waiting for matches once the point-side watermark passes
start_ts + width, so state is bounded by (lateness + interval width)
of stream history per key, not by the stream's length.

That state-expiry bound is the 100 TB argument: an unbounded
stream-stream join would accumulate every row ever seen; the interval
condition makes steady-state memory proportional to event-rate x
window, independent of how long the job has been running.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    incidents_value: float = 150.0,
    window_hours: int = 2,
    watermark: str = "2 hours",
) -> DataFrame:
    """Join each streamed event to the incident windows it falls in.

    ``points`` is the streaming events frame (event_id, ts, user_id,
    value, ...). The interval side is derived from the same stream
    (value >= incidents_value opens a [ts, ts + window) interval for
    that user). Both sides carry watermarks; the join condition is
    user equality + the time interval, which is exactly the shape
    Spark's streaming join planner needs to compute state-cleanup
    thresholds for BOTH sides.

    The watermark default matters across micro-batches: "0 seconds"
    would drop any event older than the running max(ts) as late —
    with multi-batch sources whose files are not strictly
    time-ordered, pairs silently vanish and the batch-equivalence
    contract breaks. The 2-hour default (matching windows.tumbling_agg)
    tolerates that much disorder; size it to the source's real
    lateness, trading state-store growth for late-pair completeness.
    """
    pts = points.withWatermark("ts", watermark).select(
        "event_id", "user_id", "ts"
    )
    intervals = (
        points.withWatermark("ts", watermark)
        .where(F.col("value") >= incidents_value)
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("user_id").alias("i_user_id"),
            F.col("ts").alias("start_ts"),
        )
    )
    cond = (
        (F.col("user_id") == F.col("i_user_id"))
        & (F.col("ts") >= F.col("start_ts"))
        & (
            F.col("ts")
            < F.col("start_ts") + F.expr(f"INTERVAL {window_hours} HOURS")
        )
    )
    return pts.join(intervals, cond).select(
        "incident_id",
        "event_id",
        "user_id",
        F.expr("timestampdiff(MICROSECOND, start_ts, ts)")
        .cast("bigint")
        .alias("delta_us"),
    )
