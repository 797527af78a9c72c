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


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    max_gap_minutes: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel analysis: how many users complete each prefix of an
    ordered event sequence (view -> click -> purchase), where step i+1
    must occur strictly AFTER the user's step-i completion time and —
    with ``max_gap_minutes`` — within that gap of it.

    Semantics (the standard first-touch funnel): a user's step-1 time is
    their EARLIEST step-1 event; step i+1 time is the earliest
    qualifying event after step i. Earliest-qualifying is greedy-optimal
    for the unwindowed funnel; with a gap cap it is the standard
    first-touch attribution (a user who misses the window after their
    first touch does not convert, by definition of first-touch).

    Plan: one filtered min-aggregate per step (len(steps) small-constant
    joins, each shuffling one (user, ts) pair per user — never raw
    events), all map-side combinable. Returns (step, step_name, n_users)
    with step 1-indexed.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    reached = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(_micros(events, ts_col)).alias("__t"))
    )
    counts = [(1, steps[0], reached)]
    for i, step in enumerate(steps[1:], start=2):
        # rename both join inputs' key columns up front: nxt and reached
        # share `events` as lineage, so a raw nxt[user] == reached[user]
        # can resolve to the SAME attribute and degrade to a cross join
        # with a trivially-true predicate (Spark warns; at scale it
        # would be a catastrophe, not a warning)
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("__nu"),
            _micros(events, ts_col).alias("__nt"),
        )
        prev = reached.select(
            F.col(user_col).alias("__ru"), F.col("__t")
        )
        cond = (F.col("__nu") == F.col("__ru")) & (
            F.col("__nt") > F.col("__t")
        )
        if max_gap_minutes is not None:
            cond = cond & (
                F.col("__nt") - F.col("__t")
                <= F.lit(int(max_gap_minutes) * 60 * 1_000_000)
            )
        reached = (
            nxt.join(prev, cond)
            .groupBy(F.col("__nu").alias(user_col))
            .agg(F.min("__nt").alias("__t"))
        )
        counts.append((i, step, reached))
    out = None
    for i, name, df in counts:
        # global aggregate, not a groupBy: a zero-conversion step must
        # still emit its row with n_users = 0
        c = df.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(i).cast("long").alias("step"),
            F.lit(name).alias("step_name"),
            "n_users",
        )
        out = c if out is None else out.unionByName(c)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention cohorts: users are cohorted by the Monday-start
    week of their FIRST event; for every later week in which a cohort
    member is active, the cohort's (week_offset, n_active_users) cell
    increments — the classic retention triangle behind "what fraction of
    week-k signups are still active n weeks later".

    Plan: distinct (user, week) activity (one shuffle of user-week
    pairs, never raw events), a per-user min-week aggregate, one join,
    one final count aggregate. ``week_offset`` is exact integer weeks
    (datediff // 7 on Monday-truncated dates, so it is always whole).
    Returns (cohort_week DATE, week_offset, n_active_users);
    offset 0 is the cohort's own first week.
    """
    wk = F.date_trunc("week", F.col(ts_col).cast("timestamp")).cast("date")
    activity = events.select(
        F.col(user_col).alias("u"), wk.alias("w")
    ).distinct()
    first = activity.groupBy("u").agg(F.min("w").alias("cw"))
    return (
        activity.join(first, "u")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            (F.datediff(F.col("w"), F.col("cw")) / 7).cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_active_users"))
    )
