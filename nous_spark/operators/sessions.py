"""Event sessionization: gap-based session assignment and per-session
rollups over an event stream/table.

The batch twin of the streaming stateful-window operators
(streaming/structured.py): the same "new session after a quiet gap"
semantics, expressed as partitioned window functions so Catalyst runs it
as one shuffle on the user key. At 100 TB the shuffle is keyed on
``user_col`` — naturally parallel across users, and per-user event
sequences are small enough to sort within a task (skewed robot users can
be pre-split by day before sessionizing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _micros(df: DataFrame, ts_col: str):
    """Microseconds-since-epoch for TIMESTAMP or TIMESTAMP_NTZ columns.
    NTZ values are interpreted in the session timezone (default UTC in
    this engine); gaps and durations are differences, so the choice only
    matters across a DST transition of a non-UTC session timezone."""
    c = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        c = c.cast("timestamp")
    return F.unix_micros(c)


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign each event a session: a new session starts when the gap to
    the user's previous event exceeds ``gap_minutes`` (strictly greater,
    so an event landing exactly on the threshold continues the session).

    Adds ``session_idx`` (0-based per user, in time order) and
    ``session_id`` ("<user>#<idx>", unique across users). Equal-ts ties
    need no tie-break: tied events have gap 0 to each other, so they land
    in the same session with the same index whichever order the window
    visits them — the output is deterministic even though the scan order
    is not.

    One window shuffle partitioned by user: lag + running sum of
    session-start flags — the textbook gaps-and-islands plan, identical
    in any SQL engine (the oracle runs the same two windows).
    """
    events = events.withColumn("__ts_us", _micros(events, ts_col))
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(F.col("__ts_us")).over(w)
    gap_us = F.lit(int(gap_minutes) * 60 * 1_000_000)
    is_new = F.when(
        prev.isNull() | ((F.col("__ts_us") - prev) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = events.withColumn("__new", is_new).withColumn(
        "session_idx", (F.sum("__new").over(wc) - F.lit(1)).cast("long")
    )
    return out.drop("__new", "__ts_us").withColumn(
        "session_id",
        F.concat_ws("#", F.col(user_col).cast("string"),
                    F.col("session_idx").cast("string")),
    )


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session rollup: start/end timestamps, duration, event count,
    and (optionally) the summed value column. One extra groupBy on
    (user, session_idx) after ``sessionize`` — map-side combinable, and
    partition-aligned with the sessionize window so AQE coalesces the
    two stages without a second full shuffle."""
    s = sessionize(events, gap_minutes, user_col, ts_col)
    s = s.withColumn("__ts_us", _micros(s, ts_col))
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        (F.max("__ts_us") - F.min("__ts_us")).alias("duration_us"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value"))
    return s.groupBy(
        F.col(user_col), F.col("session_idx"), F.col("session_id")
    ).agg(*aggs)
