"""Streaming continuous-aggregate maintenance for the hypertable rollup
(operators/rollup.py) — the TimescaleDB continuous-aggregate shape on
Structured Streaming.

The stream maintains ONLY the finest level (new raw data touches nothing
else); every coarser resolution is derived on read from the persisted
partials via ``operators.rollup.rollup_from_partials``, which never
re-reads raw events. Because the partial sums are ``DECIMAL(38, 12)``
(order-independent addition), the streamed state is bit-identical to a
batch rebuild no matter how the input was sliced into micro-batches —
drain == batch is asserted in tests/test_streaming.py.

Grouping uses ``F.window(ts, "<w> seconds")`` rather than the batch
``time_bucket`` expression: both floor onto the same epoch-anchored grid
(window start == time_bucket for tumbling windows with no offset), but
``window`` is what Spark recognizes as event time, so a watermark can
evict finalized buckets from state — state is bounded by watermark
horizon x key cardinality, not by stream length. In production, run in
update mode with a foreachBatch upsert keyed on (bucket_start, *keys)
into the partials store; replayed micro-batches rewrite identical rows
(the decimal partials make the upsert idempotent).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_rollup_partials(
    spark: SparkSession,
    events_dir: str,
    schema: str,
    width_seconds: int = 60,
    keys: Sequence[str] = ("event_type",),
    watermark: str = "2 hours",
    ts_col: str = "ts",
    value_col: str = "value",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of :func:`operators.rollup.rollup_partials`: maintain
    the finest-level rollup partials over a file stream. Schema matches the
    batch form — ``(bucket_start, *keys, n_events, __sum DECIMAL(38,12),
    value_min, value_max)`` — so ``rollup_from_partials`` serves every
    coarser resolution from the streamed state. ``max_files_per_trigger``
    forces a finer micro-batch slicing (the drain==batch test uses it to
    prove slicing-independence)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir).withWatermark(ts_col, watermark)
    return (
        stream.groupBy(
            F.window(ts_col, f"{width_seconds} seconds").alias("w"), *keys
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(38,12)")).alias("__sum"),
            F.min(value_col).alias("value_min"),
            F.max(value_col).alias("value_max"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            *keys,
            "n_events",
            "__sum",
            "value_min",
            "value_max",
        )
    )
