"""Temporal joins & sessionization: as-of join, band join, session ids.

Absent in the reference (SURVEY.md §2.3 note — its only temporal logic
is a poll loop, `/root/reference/data_connector.py:313-325`); declared
as part of the engine's general surface because event-time joins are
core to any 100 TB event pipeline.

Scale notes:
- ``asof_join`` is the union+window formulation: ONE shuffle on
  (key, ts) instead of the naive inequality-join + groupBy-max
  (which explodes to |L|x|R| per key before aggregating).
- ``band_join`` is a genuine theta join; Spark executes it as
  BroadcastNestedLoopJoin when one side is small — keep the small
  side explicit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    right_values: dict[str, str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the nearest right row within the
    same ``key`` — ``direction='backward'`` (default) takes the latest
    right with ``right.ts <= left.ts``; ``'forward'`` the earliest
    right with ``right.ts >= left.ts``.

    Implementation: tag and union both sides, then carry the last
    non-null right value through an ordered window
    (``last(..., ignorenulls=True)``) — a single shuffle on
    (key, ts); ``forward`` simply traverses ts DESCENDING. Right rows
    sort before left rows at equal timestamps in either direction, so
    an exactly-simultaneous right row IS matched (inclusive >=/<=
    semantics, same as DuckDB's ``ASOF JOIN``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    tagged_left = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[rc].dataType).alias(f"__rv_{out}")
          for out, rc in right_values.items()],
    )
    tagged_right = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(rc).alias(f"__rv_{out}") for out, rc in right_values.items()],
    )
    unioned = tagged_left.unionByName(tagged_right)
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_order, F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"__rv_{out}"), ignorenulls=True).over(w).alias(out)
            for out in right_values
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(out) for out in right_values]
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    *,
    broadcast_right: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Theta/band join on an arbitrary inequality condition.

    Spark plans this as BroadcastNestedLoopJoin when the right side is
    broadcast — correct for dimension-sized right sides. For fact-fact
    range joins, pre-bucketize the range key and equi-join on the
    bucket (see ``bucketed_range_join``).
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=condition, how=how)


def gap_fill_counts(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    minutes: int = 10,
) -> DataFrame:
    """Dense per-key time-bucket counts: every ``minutes`` bucket
    between a key's first and last event appears, empty buckets as 0 —
    the time_bucket_gapfill / hypertable-rollup shape.

    Plan: one (key, bucket) partial-agg shuffle for the sparse counts;
    the dense bucket axis is GENERATED (sequence+explode per key from
    the key's min/max — n_keys rows in, n_buckets out), never scanned;
    one final left join sparse->dense. Nothing in the plan is
    proportional to raw rows except the first aggregation.
    """
    bucket = F.window(F.col(ts), f"{minutes} minutes")["start"]
    sparse = (
        df.groupBy(F.col(key), bucket.alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spans = sparse.groupBy(key).agg(
        F.min("window_start").alias("__mn"), F.max("window_start").alias("__mx")
    )
    dense = spans.select(
        key,
        F.explode(
            F.sequence("__mn", "__mx", F.expr(f"INTERVAL {minutes} minutes"))
        ).alias("window_start"),
    )
    return (
        dense.join(sparse, on=[key, "window_start"], how="left")
        .select(key, "window_start", F.coalesce("n", F.lit(0)).alias("n"))
    )


def sessionize(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    gap_minutes: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same key exceeds ``gap_minutes``.

    Classic lag + conditional cumsum over one (key, ts) shuffle —
    the batch twin of streaming ``session_window`` (see
    mriya_spark.streaming).
    """
    w = Window.partitionBy(key).orderBy(ts)
    gap_s = int(gap_minutes * 60)
    # interval comparison, not epoch casts: TIMESTAMP_NTZ (how Spark 4
    # reads un-adjusted parquet timestamps) cannot be cast to a number,
    # and ts - lag(ts) > INTERVAL works uniformly for NTZ and LTZ
    new_session = (
        F.col(ts) - F.lag(F.col(ts)).over(w)
        > F.expr(f"INTERVAL '{gap_s}' SECOND")
    )
    return df.withColumn(
        session_col,
        F.sum(F.when(new_session, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered k-step funnel (strict succession) in ONE scan of the
    event log: for each user, ``t_k`` = earliest event of
    ``steps[k]`` strictly after ``t_{k-1}``, computed as k chained
    min-if window aggregates over ONE hash partitioning of the
    events — each step's condition references the previous step's
    window result, so Spark stacks k Window operators behind a single
    Exchange (no per-step join back to the event log, which is what
    makes the k-join formulation k scans and ~2k shuffles). The
    per-user rollup then reuses the same partitioning (no new
    exchange); only the final k-counter rollup moves data again —
    two shuffles total for ANY number of steps, and the event log is
    read once. Returns one row per step: (step, step_name, n_users).
    """
    if not steps:
        raise ValueError("funnel_steps needs at least one step")
    w = Window.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    tcols: list[str] = []
    for i, etype in enumerate(steps):
        cond = F.col(type_col) == etype
        if tcols:
            cond = cond & (F.col(ts_col) > F.col(tcols[-1]))
        tcol = f"__t{i + 1}"
        df = df.withColumn(
            tcol, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        tcols.append(tcol)
    # t_k is constant within a user partition; max() just picks it.
    # The groupBy inherits the window's hash partitioning — no
    # exchange between the Window stack and this rollup.
    per_user = df.groupBy(user_col).agg(
        *[F.max(t).alias(t) for t in tcols]
    )
    counts = per_user.agg(
        *[F.count(t).alias(f"__n{i}") for i, t in enumerate(tcols)]
    )
    # Column API, not a selectExpr string: step names are caller data
    # (event-type vocabularies) and must not be interpolated into SQL
    # text (a quote in a name would break the parse — r9 review)
    step_structs = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("long").alias("step"),
                F.lit(name).alias("step_name"),
                F.col(f"__n{i}").alias("n_users"),
            )
            for i, name in enumerate(steps)
        ]
    )
    return counts.select(F.inline(step_structs))
