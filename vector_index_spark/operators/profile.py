"""Column-level data-health profiling — the "what am I about to train on"
summary every large-scale pipeline runs before and after each curation
stage: per-column null counts, distinct cardinality, and min/max, in ONE
aggregate pass over the table.

Output is long-format ``(col_name, metric, value string)`` so the profile
of any table has one fixed schema. The single wide aggregate is one scan
+ one tiny shuffle regardless of column count; there is no per-column
job and no driver-side loop over data (the only driver work is building
the expression list from the schema).

``distinct="approx"`` (default) uses HLL ``approx_count_distinct`` — the
only sane cardinality at 100 TB. ``distinct="exact"`` uses
``count_distinct`` (Catalyst expands multiple distinct aggregates into
one multi-pass plan), which is what the DuckDB oracle checks at test
scale. ``distinct=None`` skips cardinality."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    distinct: str | None = "approx",
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``. Returns long-format
    rows ``(col_name, metric, value)`` with metrics ``n_nonnull, n_null,
    min, max`` and (unless ``distinct=None``) ``n_distinct``; values are
    strings so one schema fits every column type."""
    cols = list(columns) if columns is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    # duplicate names would resolve positionally to the FIRST occurrence and
    # silently profile it twice — refuse, like by-name resolution would
    dup = sorted({c for c in cols if df.columns.count(c) > 1})
    if dup:
        raise ValueError(f"duplicate column names cannot be profiled: {dup}")
    if distinct not in ("approx", "exact", None):
        raise ValueError(f"distinct must be 'approx', 'exact' or None: {distinct!r}")

    # positional __c{i} renames via toDF: raw column names never enter an
    # alias, a SQL string, or the column resolver (which parses backticks),
    # so names containing quotes/backticks profile correctly
    positions = [df.columns.index(c) for c in cols]
    safe = df.toDF(*[f"__in{i}" for i in range(len(df.columns))])
    aggs = [F.count(F.lit(1)).alias("__n")]
    metrics = ["n_nonnull", "n_null", "min", "max"]
    for i, pos in enumerate(positions):
        src = F.col(f"__in{pos}")
        aggs += [
            F.count(src).alias(f"__c{i}__n_nonnull"),
            F.min(src).cast("string").alias(f"__c{i}__min"),
            F.max(src).cast("string").alias(f"__c{i}__max"),
        ]
        if distinct == "approx":
            aggs.append(F.approx_count_distinct(src).alias(f"__c{i}__n_distinct"))
        elif distinct == "exact":
            aggs.append(F.count_distinct(src).alias(f"__c{i}__n_distinct"))
    if distinct is not None:
        metrics.append("n_distinct")
    wide = safe.agg(*aggs)

    # pivot the single wide row to long format by exploding an array of
    # structs (still lazy — no driver collect; column names appear only as
    # literals, the expressions reference the safe positional aliases)
    def _entry(name: str, metric: str, value):
        return F.struct(
            F.lit(name).alias("col_name"),
            F.lit(metric).alias("metric"),
            value.cast("string").alias("value"),
        )

    entries = []
    for i, c in enumerate(cols):
        entries += [
            _entry(c, "n_nonnull", F.col(f"__c{i}__n_nonnull")),
            _entry(c, "n_null", F.col("__n") - F.col(f"__c{i}__n_nonnull")),
            _entry(c, "min", F.col(f"__c{i}__min")),
            _entry(c, "max", F.col(f"__c{i}__max")),
        ]
        if distinct is not None:
            entries.append(_entry(c, "n_distinct", F.col(f"__c{i}__n_distinct")))
    return wide.select(
        F.explode(F.array(*entries)).alias("__e")
    ).select("__e.col_name", "__e.metric", "__e.value")
