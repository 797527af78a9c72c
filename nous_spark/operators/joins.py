"""Temporal joins Spark lacks as built-ins: as-of join and range
(interval) join.

Both are classic time-series/KG-pipeline primitives (pandas
``merge_asof``, kdb ``aj``, DuckDB ``ASOF JOIN``; Flink interval joins).
The reference engine never needed them (its temporal mining pins exact
window ids, see Mining/src TemporalPattern handling re-expressed in
operators/mining_exact.py), but any event/quad pipeline feeding this
engine does, so they are first-class here.

Scale design
------------
``asof_join`` is implemented WITHOUT a join: both sides are unioned and
a single per-key ordered window carries the most recent right-side row
forward (``last(..., ignorenulls=True)``). One shuffle on the key, no
candidate-pair blowup, no range predicate for the optimizer to
mis-plan as a broadcast-nested-loop. At 100 TB the shuffle is keyed on
``on`` — naturally parallel across keys; per-key sequences sort within
a task exactly like sessionize (operators/sessions.py).

``range_join`` buckets time: intervals explode to every bucket they
cover, points land in exactly one bucket, and the equi-join on
(key, bucket) is followed by the exact predicate. Each qualifying
(interval, point) pair is emitted exactly once — the point's bucket is
unique — so no dedup pass. Cost is linear in interval coverage
(length / bucket_width); pick ``bucket_seconds`` near the typical
interval length so each interval explodes to O(1) buckets.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _micros(df: DataFrame, ts_col: str) -> Column:
    """Microseconds-since-epoch; NTZ interpreted in session tz (UTC)."""
    c = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        c = c.cast("timestamp")
    return F.unix_micros(c)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    strict: bool = False,
    tolerance_seconds: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: for every left row, attach the single right row
    with the greatest ``right_ts`` <= ``left_ts`` (direction
    ``backward``; ``forward`` takes the smallest right_ts >= left_ts)
    sharing the ``on`` key. Every left row survives (left-outer
    semantics); unmatched rows carry nulls.

    Semantics pinned for oracle parity with DuckDB's ``ASOF JOIN``:

    - ``strict=False`` (default): a right row at exactly ``left_ts``
      matches. ``strict=True`` requires a strictly earlier/later row.
    - Right-side ties (several right rows at the same (key, ts)) are
      collapsed BEFORE matching to the row with the greatest payload
      tuple (struct-max over the non-key, non-ts columns, in their
      projected order) — deterministic, and expressible in ANSI SQL as
      an ``arg_max``/``QUALIFY`` pre-pass.
    - ``tolerance_seconds``: a match farther than this from the left
      timestamp is nulled out (the left row is kept).
    - Null keys: the window groups nulls together, so null-keyed left
      rows match null-keyed right rows — unlike an SQL equi-join.
      Filter nulls upstream if SQL semantics are needed.

    Implementation is union + one ordered window per key (no join): the
    right payload rides a struct column that ``last(ignorenulls=True)``
    carries forward in (ts, side) order. The side tag breaks equal-ts
    ordering so that strictness is exact: non-strict sorts right rows
    before left at the same instant, strict sorts them after.

    Right payload columns keep their names unless they collide with a
    left column, in which case ``suffix`` is appended. The matched right
    timestamp is always emitted as ``right_ts + suffix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)
    left_cols = left.columns
    payload_cols = [c for c in right.columns if c not in on + [right_ts]]
    if not payload_cols:
        raise ValueError("right side has no payload columns")
    out_names = {
        c: (c + suffix if c in left_cols else c) for c in payload_cols
    }
    ts_out = right_ts + suffix

    # Collapse right-side (key, ts) ties to the greatest payload tuple.
    r_us = _micros(right, right_ts)
    r = (
        right.select(*on, r_us.alias("__us"),
                     F.struct(*[F.col(c) for c in payload_cols]).alias("__p"))
        .groupBy(*on, "__us")
        .agg(F.max("__p").alias("__p"))
    )

    sign = 1 if direction == "backward" else -1
    # Equal-instant ordering: visible side first. Non-strict → the right
    # row must be seen by a same-ts left row → right gets the smaller tag.
    right_tag, left_tag = (0, 1) if not strict else (1, 0)

    l_us = _micros(left, left_ts)
    lhs = left.select(
        F.struct(*[F.col(c) for c in left_cols]).alias("__l"),
        *[F.col(c).alias(f"__k{i}") for i, c in enumerate(on)],
        (l_us * sign).alias("__ord"),
        l_us.alias("__us"),
        F.lit(left_tag).alias("__tag"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        F.lit(None).cast("long").alias("__rus"),
    )
    rhs = r.select(
        F.lit(None).cast(lhs.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__k{i}") for i, c in enumerate(on)],
        (F.col("__us") * sign).alias("__ord"),
        F.col("__us"),
        F.lit(right_tag).alias("__tag"),
        F.col("__p"),
        F.col("__us").alias("__rus"),
    )
    keys = [f"__k{i}" for i in range(len(on))]
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ord", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = lhs.unionByName(rhs)
    # For strict matching at equal instants the left row sorts first and
    # correctly cannot see the same-ts right row; for non-strict the
    # right row sorts first and is carried into it. Earlier right rows
    # are carried either way.
    carried = u.select(
        "__l", "__us",
        F.last("__p", ignorenulls=True).over(w).alias("__m"),
        F.last("__rus", ignorenulls=True).over(w).alias("__mus"),
        "__tag",
    ).where(F.col("__tag") == left_tag).drop("__tag")
    if tolerance_seconds is not None:
        tol_us = int(tolerance_seconds * 1_000_000)
        ok = (sign * (F.col("__us") - F.col("__mus"))) <= F.lit(tol_us)
        carried = carried.select(
            "__l", "__us",
            F.when(ok, F.col("__m")).alias("__m"),
            F.when(ok, F.col("__mus")).alias("__mus"),
        )
    out = carried.select(
        *[F.col("__l")[c].alias(c) for c in left_cols],
        *[F.col("__m")[c].alias(out_names[c]) for c in payload_cols],
        F.timestamp_micros(F.col("__mus")).alias(ts_out),
    )
    return out


def range_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    ts_col: str = "ts",
    on: Sequence[str] = (),
    bucket_seconds: int = 3600,
    suffix: str = "_p",
) -> DataFrame:
    """Inner join of intervals [start_col, end_col] (closed on both
    ends) with points whose ``ts_col`` falls inside, optionally also
    equi-keyed on ``on``. Emits one row per qualifying (interval, point)
    pair, exactly once.

    The naive formulation (`theta-join on BETWEEN`) plans as a
    broadcast-nested-loop — quadratic at scale. Here both sides gain a
    time-bucket key: an interval explodes (``sequence`` + ``explode``)
    to every ``bucket_seconds``-wide bucket it overlaps, a point belongs
    to exactly one, and Spark runs a plain shuffled equi-join on
    (buckets ∪ on) followed by the exact BETWEEN filter. Exactly-once
    emission falls out of the point's bucket being unique — no distinct
    pass. Skew: a pathologically long interval explodes to
    length/bucket_seconds rows; pick the bucket near the typical
    interval length (explosion O(1)) and cap outliers upstream.

    Point columns colliding with interval columns get ``suffix``.
    """
    on = list(on)
    b_us = int(bucket_seconds) * 1_000_000
    i_cols = intervals.columns
    p_cols = points.columns
    p_out = {
        c: (c + suffix if c in i_cols else c)
        for c in p_cols if c not in on
    }

    s_us = _micros(intervals, start_col)
    e_us = _micros(intervals, end_col)
    iv = intervals.select(
        "*", s_us.alias("__s"), e_us.alias("__e")
    ).where(F.col("__s") <= F.col("__e"))
    iv = iv.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("__s") / F.lit(b_us)),
                F.floor(F.col("__e") / F.lit(b_us)),
            )
        ).alias("__b"),
    )
    t_us = _micros(points, ts_col)
    pt = points.select(
        *[F.col(c).alias(c) for c in on],
        *[F.col(c).alias(p_out[c]) for c in p_cols if c not in on],
        t_us.alias("__t"),
    ).withColumn("__b", F.floor(F.col("__t") / F.lit(b_us)))

    joined = iv.join(pt, on=on + ["__b"], how="inner").where(
        (F.col("__t") >= F.col("__s")) & (F.col("__t") <= F.col("__e"))
    )
    return joined.select(
        *[F.col(c) for c in i_cols],
        *[F.col(p_out[c]) for c in p_cols if c not in on],
    )
