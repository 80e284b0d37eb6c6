"""Event-stream operators: tumbling-window aggregation and session windows,
in both batch and Structured Streaming form.

The reference has no streaming at all (SURVEY §2D — absent; BASELINE.json
rules online ANN serving out of scope), so this module covers the
north-star pipeline need instead: the same windowed aggregation runs as a
batch query (oracle-checkable) and as a ``readStream`` with a watermark
(late-data handling), proving the operator is expressible in both modes —
the Spark guarantee that batch and streaming share one API.

Scale notes: tumbling windows aggregate with map-side partials (state is
bounded by watermark horizon x group cardinality); session windows in
streaming use Spark's native session_window state management.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_event_stats(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows per event_type: count, value sum/avg.
    Returns (window_start, event_type, n_events, value_sum, value_avg)."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
            F.round(F.avg("value"), 6).alias("value_avg"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
            "value_avg",
        )
    )


def stream_hourly_event_stats(
    spark: SparkSession,
    events_dir: str,
    schema: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of :func:`hourly_event_stats`: file source +
    watermark; run with trigger(availableNow=True) to drain the backlog.
    Late rows beyond the watermark are dropped (late-data contract)."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .withWatermark("ts", watermark)
    )
    return (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
            F.round(F.avg("value"), 6).alias("value_avg"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
            "value_avg",
        )
    )


def stream_session_windows(
    spark: SparkSession,
    events_dir: str,
    schema: str,
    gap: str = "10 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of :func:`session_windows`: session_window under a
    watermark — sessions finalize once the watermark passes their gap."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .withWatermark("ts", watermark)
    )
    return (
        stream.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


def session_windows(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Per-user session windows (gap-based): a session closes after ``gap``
    of inactivity. Returns (user_id, session_start, session_end, n_events,
    value_sum). Uses Spark's native session_window (also valid under
    readStream + watermark for the streaming flavor)."""
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


def dedup_first_by_key(
    events: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Batch dedup-to-first-arrival: one row per key, earliest (ts,
    event_id) wins. The batch twin of :func:`stream_dedup`; a plain
    min_by aggregation (one shuffle on the key, map-side partials)."""
    keys = keys or ["user_id", "event_type"]
    others = [c for c in events.columns if c not in keys]
    return events.groupBy(*keys).agg(
        *[
            F.expr(
                f"min_by({c}, struct(ts, event_id))"
            ).alias(c)
            for c in others
        ]
    )


def stream_dedup(
    spark: SparkSession,
    events_dir: str,
    schema: str,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup over a key subset with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps one row per key and expires
    key state once the watermark passes — the streaming-ingest guard for
    at-least-once sources (state is O(keys inside the watermark horizon),
    not O(all keys ever), which is what makes it viable on an unbounded
    100 TB/day feed)."""
    keys = keys or ["user_id", "event_type"]
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .withWatermark("ts", watermark)
    )
    return stream.dropDuplicatesWithinWatermark(keys)


def clicks_before_purchase_pairs(
    events: DataFrame, lookback_seconds: int = 3600
) -> DataFrame:
    """Batch twin of :func:`stream_click_purchase_join`: every
    (purchase, click) pair for the same user with the click in the
    ``lookback_seconds`` window ending at the purchase. Equi-join on
    user_id (hash-partitioned both sides); the time window is a residual
    predicate inside the joined partition — no range explosion."""
    p = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return p.join(
        c,
        (p.user_id == c.c_user_id)
        & (c.click_ts <= p.purchase_ts)
        & (c.click_ts >= p.purchase_ts - F.expr(f"INTERVAL {lookback_seconds} SECONDS")),
        "inner",
    ).select("user_id", "purchase_id", "purchase_ts", "click_id", "click_ts")


def stream_click_purchase_join(
    spark: SparkSession,
    events_dir: str,
    schema: str,
    lookback_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: purchases matched to the same user's
    clicks within the preceding ``lookback_seconds``. Both sides carry a
    watermark and the join condition bounds event time on both sides, so
    Spark can expire click state once no future purchase can reach it —
    state stays O(watermark horizon), the requirement for an unbounded
    feed. Drain with trigger(availableNow=True); output equals the batch
    twin :func:`clicks_before_purchase_pairs` (asserted in
    tests/test_streaming.py)."""
    clicks = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        F.expr(
            "user_id = c_user_id AND "
            "click_ts <= purchase_ts AND "
            f"click_ts >= purchase_ts - INTERVAL {lookback_seconds} SECONDS"
        ),
        "inner",
    ).select("user_id", "purchase_id", "purchase_ts", "click_id", "click_ts")
