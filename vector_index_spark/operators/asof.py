"""As-of (point-in-time) join and keyed range join.

The reference engine has no temporal operators at all; these are part of
the north-star training-pipeline surface (joining feature/event streams
to the most recent dimension snapshot is the canonical feature-store
lookup). Both are expressed so the *equi key* carries the shuffle and no
range predicate ever explodes into a cross product.

``asof_join`` — for each probe row, the latest reference row with
``ref_ts <= probe_ts`` for the same key — uses the union+window plan:

    union(probe tagged 1, ref tagged 0)
      -> single shuffle on the key
      -> window last(ref payload, ignorenulls) ordered by (ts, tag)
      -> keep probe rows

One exchange, no range join, no per-key collect; state per window frame
is one reference payload (``last`` needs only the running value). This is
the standard scalable as-of plan (the same shape Flink's temporal join
and pandas ``merge_asof`` use), and is exactly equivalent to DuckDB's
``ASOF LEFT JOIN`` oracle when the reference side has one row per
(key, ts) — callers with duplicate reference timestamps must pre-aggregate
(otherwise "which duplicate wins" is engine-defined on both sides).

``range_count_join`` — equi key + time-interval predicate — is a plain
shuffled equi join with a residual range filter: Catalyst keeps user_id
as the join key, so the work per key is bounded by key cardinality, not
by the interval width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    keys: list[str],
    probe_ts: str = "ts",
    ref_ts: str = "ts",
) -> DataFrame:
    """Latest-ref-at-or-before-probe join (backward as-of, left-outer).

    Returns every ``probe`` column, plus ``asof_ts`` (the matched
    reference timestamp, null if none) and every non-key, non-ts column
    of ``ref`` (null if none). ``ref`` must be unique per (keys, ref_ts).
    """
    payload_cols = [c for c in ref.columns if c not in keys and c != ref_ts]
    probe_cols = [c for c in probe.columns]

    ref_side = ref.select(
        *keys,
        F.col(ref_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.struct(
            F.col(ref_ts).alias("asof_ts"),
            *[F.col(c) for c in payload_cols],
        ).alias("__ref"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(f"__p_{c}")
          for c in probe_cols],
    )
    probe_side = probe.select(
        *keys,
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(ref_side.schema["__ref"].dataType).alias("__ref"),
        *[F.col(c).alias(f"__p_{c}") for c in probe_cols],
    )

    # tag orders ref before probe at equal ts, so ts-equality matches
    # (probe_ts >= ref_ts) are visible to last().
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        ref_side.unionByName(probe_side)
        .withColumn("__match", F.last("__ref", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    return joined.select(
        *[F.col(f"__p_{c}").alias(c) for c in probe_cols],
        F.col("__match.asof_ts").alias("asof_ts"),
        *[F.col(f"__match.{c}").alias(c) for c in payload_cols],
    )


def range_count_join(
    probe: DataFrame,
    ref: DataFrame,
    keys: list[str],
    probe_ts: str = "ts",
    ref_ts: str = "ts",
    lookback_seconds: int = 3600,
    count_name: str = "n_in_range",
) -> DataFrame:
    """Per probe row: count of ref rows for the same key with
    ``probe_ts - lookback <= ref_ts <= probe_ts``. Left-outer (count 0
    when none). Equi keys keep the join hash-partitioned; the range is a
    residual predicate evaluated inside the joined partition."""
    r = ref.select(*keys, F.col(ref_ts).alias("__rts"))
    cond = None
    for k in keys:
        c = probe[k] == r[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (r["__rts"] <= probe[probe_ts])
        & (r["__rts"] >= probe[probe_ts] - F.expr(f"INTERVAL {lookback_seconds} SECONDS"))
    )
    probe_cols = [probe[c] for c in probe.columns]
    return (
        probe.join(r, cond, "left")
        .groupBy(*probe_cols)
        .agg(F.count("__rts").alias(count_name))
    )
