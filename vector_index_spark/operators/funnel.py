"""Event-sequence analytics: ordered funnels, retention cohorts, and
volume-anomaly detection.

The reference has no event surface at all (SURVEY §1.2 — its only data
type is dense float32 vectors, source/dehnsw.h:39); these are the
product-analytics queries a training-data/event pipeline runs daily, in
the shapes ClickHouse (``windowFunnel``/``retention``) and every
warehouse popularized. All three are Catalyst-native — no Python in the
hot path — and every floating-point output derives from EXACT integer or
decimal aggregates through a fixed number of scalar double ops, so the
results are bit-identical on any partitioning (the q65 rollup lesson:
never let a float accumulation order reach the output).

Scale notes (100 TB events):
- funnel: k steps = k aggregate+join rounds, all keyed on the user
  column, and after step 1 each round's input is filtered to ONE event
  type (and for steps >= 2 semi-joined against survivors) before it
  shuffles — volume drops monotonically down the funnel.
- retention: the (cohort_day, offset, user) triple is deduplicated
  map-side BEFORE the count shuffle (the two-level exact-distinct shape,
  SCALE.md) — the wide shuffle carries distinct triples, not raw events.
- anomalies: hourly counts are a map-side partial count; the per-type
  moment pass runs over ~one row per (type, hour), negligible next to
  the scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    within_seconds: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel over an event stream.

    A user reaches step k when their FIRST step-k event at-or-after the
    timestamp at which they reached step k-1 exists (and arrives within
    ``within_seconds`` of it, when given — the per-hop conversion window,
    ClickHouse ``windowFunnel`` anchors the whole window at step 1; the
    per-hop anchor composes better and is what we define here). Returns
    one row per step: ``(step_idx, step, n_users, conv_rate)`` with
    ``conv_rate`` relative to step 1, rounded to 6 decimals (exact
    integer division — deterministic).

    The final unpartitioned window runs over exactly ``len(steps)`` rows
    (the per-step counts), so its single task is bounded by the funnel
    length, never the data.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        # the min-based formulation is event-identity-blind: with a
        # repeated step name one event at ts t would satisfy both hops
        # (t >= t), diverging from the consume-once streaming twin.
        raise ValueError(f"step names must be distinct, got {list(steps)}")
    reached = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    levels = [reached]
    for step in steps[1:]:
        nxt = events.filter(F.col(type_col) == step).join(
            levels[-1].select(user_col, F.col("__t").alias("__prev")),
            on=user_col,
        )
        cond = F.col(ts_col) >= F.col("__prev")
        if within_seconds is not None:
            # interval arithmetic, not epoch math: timezone-free and
            # identical in any ANSI SQL oracle
            cond = cond & (
                F.col(ts_col)
                <= F.col("__prev")
                + F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
            )
        levels.append(
            nxt.filter(cond).groupBy(user_col).agg(F.min(ts_col).alias("__t"))
        )
    counts = None
    for i, (step, lvl) in enumerate(zip(steps, levels), start=1):
        row = lvl.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step_idx"), F.lit(step).alias("step"), "n_users"
        )
        counts = row if counts is None else counts.unionByName(row)
    w = Window.orderBy("step_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return counts.select(
        "step_idx",
        "step",
        "n_users",
        F.round(
            F.col("n_users") / F.first("n_users").over(w), 6
        ).alias("conv_rate"),
    ).orderBy("step_idx")


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic D-n retention: cohort = the calendar day of a user's first
    event; a cohort member is retained at offset d when they have any
    event on cohort_day + d. Returns ``(cohort_day, day_offset, n_active,
    cohort_size, retention)`` — retention rounded to 6 decimals (one
    exact integer division).

    The count shuffle sees DISTINCT (cohort_day, day_offset, user)
    triples only — `.distinct()` partial-aggregates map-side, so raw
    event volume never crosses the wire twice.
    """
    first_day = events.groupBy(user_col).agg(
        F.min(F.to_date(ts_col)).alias("cohort_day")
    )
    sizes = first_day.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    # one distinct suffices: (user, day) is unique after it, and the
    # 1:1 join + (cohort_day, offset) derivation preserve uniqueness
    triples = (
        events.select(user_col, F.to_date(ts_col).alias("__day"))
        .distinct()
        .join(first_day, on=user_col)
        .select(
            "cohort_day",
            F.datediff("__day", "cohort_day").alias("day_offset"),
            user_col,
        )
    )
    ret = triples.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    return (
        ret.join(sizes, on="cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_day", "day_offset")
    )


def hourly_count_anomalies(
    events: DataFrame,
    z_threshold: float = 2.0,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Flag hours whose event volume is a z-score outlier for its type.

    Every AGGREGATE is exact integer arithmetic: hourly counts are
    bigints, the per-type moment pass carries their sum (bigint) and
    sum-of-squares (``DECIMAL(38,0)`` over ``DECIMAL(18,0)`` squares —
    within both Spark's and DuckDB's multiply-precision rules), both
    order-independent. mean/var/std/z are then a FIXED per-row tree of
    IEEE-double scalar ops over those exact sums — deterministic on any
    partitioning and bit-identical to a SQL oracle writing the same tree
    (every individual double op is correctly rounded in both engines).
    Population variance ``E[x²] − mean²`` (divide by n, ``stddev_pop``
    semantics).

    Returns flagged rows ``(event_type, bucket_start, n_events, mean_n,
    std_n, z)`` with the floats rounded to 6 decimals.
    """
    hourly = events.groupBy(
        type_col, F.date_trunc("hour", F.col(ts_col)).alias("bucket_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    sq = F.col("n_events").cast("decimal(18,0)")
    moments = hourly.groupBy(type_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("n_events").alias("__s"),
        F.sum((sq * sq).cast("decimal(38,0)")).alias("__ss"),
    )
    joined = hourly.join(F.broadcast(moments), on=type_col)
    mean = F.col("__s").cast("double") / F.col("__n")
    ex2 = F.col("__ss").cast("double") / F.col("__n")
    std = F.sqrt(ex2 - mean * mean)
    z = (F.col("n_events") - mean) / std
    return (
        joined.select(
            type_col,
            "bucket_start",
            "n_events",
            F.round(mean, 6).alias("mean_n"),
            F.round(std, 6).alias("std_n"),
            F.round(z, 6).alias("z"),
        )
        # std_n > 0 guard: a constant-volume type has no outliers by
        # definition, and 0/0 diverges across engines (Spark NULL-drops
        # the row, IEEE SQL engines produce NaN and may keep it)
        .filter((F.col("std_n") > 0) & (F.abs(F.col("z")) >= z_threshold))
        .orderBy(type_col, "bucket_start")
    )
