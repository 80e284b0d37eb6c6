"""Hypertable-style multi-resolution time-bucket rollups.

The reference has no time-series surface at all (SURVEY §1.2 — dense
float32 vectors are its only data type, source/dehnsw.h:39); this is a
north-star training-pipeline operator: continuous aggregates over an
event table at several resolutions, where each coarser resolution is
derived from the next-finer level's PARTIAL aggregates rather than from
the raw table. At 100 TB that is the difference between scanning the raw
data once versus once per resolution, and it is what makes the rollup
incrementally maintainable: new raw data touches only the finest level,
and coarser levels re-aggregate bounded partials.

Compositional aggregates only: count and sum add, min/max combine, and
avg is re-derived as sum/count at output time — never averaged across
levels. Sums are carried as ``DECIMAL(38, 12)`` between levels: decimal
addition is associative and order-independent, so the partial-derived
coarse sums are bit-identical to a direct group-by over raw rows on ANY
partitioning (a float64 sum is not — its value depends on accumulation
order, which follows the cluster layout). The decimal is cast back to
double only in the output projection, where the single ``round(·, 6)``
happens.

Plan shape: the finest-level aggregate subtree is byte-identical under
every output level, so Catalyst's exchange-reuse rule collapses them —
``.explain`` shows one scan + one partial-aggregate exchange feeding all
resolutions (asserted in tests/test_rollup.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(ts: Column | str, width_seconds: int) -> Column:
    """Floor a timestamp onto a ``width_seconds`` grid anchored at the
    epoch (TimescaleDB ``time_bucket`` semantics for sub-week widths).

    Pure epoch arithmetic — no calendar origin — so Spark and any SQL
    oracle agree bit-for-bit: ``make_timestamp(floor(epoch(ts)/w)*w * 1e6)``
    in DuckDB."""
    if width_seconds <= 0:
        raise ValueError(f"width_seconds must be positive, got {width_seconds}")
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(ts) / F.lit(width_seconds)).cast("long")
        * width_seconds
    )


def _validate_widths(widths: Sequence[int]) -> list[int]:
    ws = list(widths)
    if ws != sorted(ws) or len(set(ws)) != len(ws):
        raise ValueError(f"widths must be strictly ascending, got {widths}")
    for finer, coarser in zip(ws, ws[1:]):
        if coarser % finer != 0:
            raise ValueError(
                f"each width must divide the next: {coarser} % {finer} != 0"
            )
    return ws


def rollup_partials(
    events: DataFrame,
    width_seconds: int,
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Finest-level partial aggregates — the persisted continuous-aggregate
    state. Schema: ``(bucket_start, *keys, n_events, __sum DECIMAL(38,12),
    value_min, value_max)``. Decimal accumulation is order-independent,
    so the partials do not depend on partitioning / shuffle layout —
    partials computed over ANY disjoint slicing of the raw table (batch
    partitions, streaming micro-batches, incremental loads) combine to
    bit-identical totals via :func:`combine_partials`."""
    return events.groupBy(
        time_bucket(ts_col, width_seconds).alias("bucket_start"), *keys
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(38,12)")).alias("__sum"),
        F.min(value_col).alias("value_min"),
        F.max(value_col).alias("value_max"),
    )


def combine_partials(
    partials: DataFrame, width_seconds: int, keys: Sequence[str]
) -> DataFrame:
    """Re-aggregate partial rows onto the same or a coarser grid: count and
    sum add, min/max combine. ``width_seconds`` equal to the partials' own
    grid merges duplicate buckets (e.g. one row per streaming micro-batch)
    without coarsening; a multiple of it derives the next resolution."""
    return partials.groupBy(
        time_bucket("bucket_start", width_seconds).alias("bucket_start"),
        *keys,
    ).agg(
        F.sum("n_events").alias("n_events"),
        # Spark widens sum(decimal(38,12)); re-cast so every level
        # carries the same type.
        F.sum("__sum").cast("decimal(38,12)").alias("__sum"),
        F.min("value_min").alias("value_min"),
        F.max("value_max").alias("value_max"),
    )


def _finalize(level: DataFrame, w: int, key_cols: Sequence[str]) -> DataFrame:
    return level.select(
        F.lit(w).cast("long").alias("resolution_s"),
        "bucket_start",
        *key_cols,
        "n_events",
        F.round(F.col("__sum").cast("double"), 6).alias("value_sum"),
        F.round("value_min", 6).alias("value_min"),
        F.round("value_max", 6).alias("value_max"),
        # double(exact_sum) / n in IEEE double — deterministic because
        # the decimal sum is exact; matches the oracle's
        # round(CAST(sum AS DOUBLE) / count, 6) bit-for-bit.
        F.round(
            F.col("__sum").cast("double") / F.col("n_events"), 6
        ).alias("value_avg"),
    )


def _derive_and_union(
    level: DataFrame, ws: list[int], key_cols: list[str]
) -> DataFrame:
    levels = [(ws[0], level)]
    for w in ws[1:]:
        level = combine_partials(level, w, key_cols)
        levels.append((w, level))
    out = None
    for w, lvl in levels:
        projected = _finalize(lvl, w, key_cols)
        out = projected if out is None else out.unionByName(projected)
    return out


def multi_resolution_rollup(
    events: DataFrame,
    widths: Sequence[int] = (60, 3600, 86400),
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Roll ``events`` up to every resolution in ``widths`` (seconds,
    ascending; each must divide the next). Returns one DataFrame with
    ``(resolution_s, bucket_start, *keys, n_events, value_sum, value_min,
    value_max, value_avg)`` — the union of all levels.

    The finest level aggregates the raw table; every coarser level
    aggregates the previous level's partials (count/sum add, min/max
    combine), so the raw table is scanned exactly once regardless of how
    many resolutions are requested."""
    ws = _validate_widths(widths)
    key_cols = list(keys)
    level = rollup_partials(events, ws[0], key_cols, ts_col, value_col)
    return _derive_and_union(level, ws, key_cols)


def rollup_from_partials(
    partials: DataFrame,
    widths: Sequence[int] = (60, 3600, 86400),
    keys: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Derive the full multi-resolution rollup from PERSISTED finest-level
    partials (:func:`rollup_partials` output, batched or streamed) — the
    incremental-maintenance read path: raw events are never re-read, and
    duplicate bucket rows from separate loads/micro-batches are combined
    exactly first. ``widths[0]`` must be the grid the partials were
    computed on. Output is bit-identical to
    :func:`multi_resolution_rollup` over the raw table (decimal sums are
    associative), on any slicing — asserted in tests/test_rollup.py."""
    ws = _validate_widths(widths)
    key_cols = list(keys)
    level = combine_partials(partials, ws[0], key_cols)
    return _derive_and_union(level, ws, key_cols)


def gap_fill_forward(
    events: DataFrame,
    step_seconds: int = 3600,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    method: str = "locf",
) -> DataFrame:
    """Time-series gap filling (TimescaleDB ``time_bucket_gapfill``
    semantics): bucket events onto a ``step_seconds`` grid per key,
    generate the complete per-key bucket spine between that key's first
    and last bucket, and fill empty buckets by

      - ``method="locf"``: carry the last observed mean forward;
      - ``method="linear"``: interpolate between the surrounding observed
        anchors (``interpolate`` semantics) — every gap inside the spine
        has both anchors by construction, so no NULLs result.

    Returns ``(key, bucket_start, n_events, filled_mean)`` where
    ``n_events`` is 0 for generated gap rows and means are exact
    (DECIMAL-summed, partition-order independent); rounding happens once
    at the output, AFTER the fill.

    Scale shape: one groupBy shuffle over raw events (map-side partial);
    the spine is ``sequence()``-generated from a per-key min/max aggregate
    (bounded: keys x buckets, tiny next to raw data); the fill windows
    partition by key over bucket rows, never raw rows."""
    from pyspark.sql import Window

    if method not in ("locf", "linear"):
        raise ValueError(f"method must be 'locf' or 'linear': {method!r}")
    # F.floor (not cast-to-long, which truncates toward zero) so pre-1970
    # timestamps bucket DOWN like time_bucket_gapfill / the time_bucket
    # helper above
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_seconds).cast("long")
        * step_seconds
    )
    hourly = events.groupBy(
        F.col(key_col).alias("key"), bucket.alias("__b")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        # mean over OBSERVED values: count(value) excludes NULLs from the
        # denominator. A bucket whose values are all NULL gets a NULL mean
        # and is filled like a gap (n_events still reports its raw rows).
        (
            F.sum(F.col(value_col).cast("decimal(38,12)")).cast("double")
            / F.count(F.col(value_col))
        ).alias("__mean"),
    )
    spine = (
        hourly.groupBy("key")
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
        .select(
            "key",
            F.explode(
                F.sequence("__lo", "__hi", F.lit(int(step_seconds)))
            ).alias("__b"),
        )
    )
    wback = (
        Window.partitionBy("key")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = spine.join(hourly, ["key", "__b"], "left")
    if method == "locf":
        filled = F.last("__mean", ignorenulls=True).over(wback)
    else:
        wfwd = (
            Window.partitionBy("key")
            .orderBy("__b")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        obs_b = F.when(F.col("__mean").isNotNull(), F.col("__b"))
        prev_v = F.last("__mean", ignorenulls=True).over(wback)
        prev_b = F.last(obs_b, ignorenulls=True).over(wback)
        next_v = F.first("__mean", ignorenulls=True).over(wfwd)
        next_b = F.first(obs_b, ignorenulls=True).over(wfwd)
        filled = F.when(F.col("__mean").isNotNull(), F.col("__mean")).otherwise(
            F.when(
                prev_b.isNotNull() & next_b.isNotNull(),
                prev_v
                + (next_v - prev_v)
                * (F.col("__b") - prev_b)
                / (next_b - prev_b),
            ).otherwise(F.coalesce(prev_v, next_v))
        )
    return joined.select(
        F.col("key").alias(key_col),
        F.timestamp_seconds("__b").alias("bucket_start"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.round(filled, 6).alias("filled_mean"),
    )
