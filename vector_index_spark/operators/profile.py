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
    if distinct not in ("approx", "exact", None):
        raise ValueError(f"distinct must be 'approx', 'exact' or None: {distinct!r}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    metrics = ["n_nonnull", "n_null", "min", "max"]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__n_nonnull"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
        if distinct == "approx":
            aggs.append(F.approx_count_distinct(c).alias(f"{c}__n_distinct"))
        elif distinct == "exact":
            aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__n_distinct"))
    if distinct is not None:
        metrics.append("n_distinct")
    wide = df.agg(*aggs)

    # pivot the single wide row to long format with one stack() expression
    # (still lazy — no driver collect)
    pairs = []
    for c in cols:
        pairs += [
            f"'{c}'", "'n_nonnull'", f"CAST(`{c}__n_nonnull` AS STRING)",
            f"'{c}'", "'n_null'", f"CAST(__n - `{c}__n_nonnull` AS STRING)",
            f"'{c}'", "'min'", f"`{c}__min`",
            f"'{c}'", "'max'", f"`{c}__max`",
        ]
        if distinct is not None:
            pairs += [
                f"'{c}'", "'n_distinct'", f"CAST(`{c}__n_distinct` AS STRING)",
            ]
    n_rows = len(cols) * len(metrics)
    stack = f"stack({n_rows}, {', '.join(pairs)}) AS (col_name, metric, value)"
    return wide.selectExpr(stack)
