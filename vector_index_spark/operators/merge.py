"""Keyed-table maintenance: MERGE upsert and SCD2 history application.

The reference mutates its index through add/remove (python_binding
dehnswpy.cpp); a data PLATFORM mutates keyed tables — the Delta/Iceberg
``MERGE INTO`` shape and the slowly-changing-dimension (type 2) history
pattern every warehouse maintains. Both are expressed as single
keyed joins (plus one per-key window to pick the latest change), so the
shuffle is on the merge key and AQE handles skew; no driver-side state,
no row-at-a-time Python.

Scale notes (100 TB target):
- ``merge_upsert``: one full-outer shuffle join on the key. In a real
  lakehouse deployment the target side would additionally be pruned to
  the partitions the update batch touches (partition values are known
  from the batch — standard merge-pushdown); the operator itself is
  partition-agnostic.
- ``scd2_apply``: the change batch is first collapsed to its latest row
  per key (window over the batch only — batches are small relative to
  the dimension), then ONE full-outer join against current rows decides
  close/open/insert per key; closed history rows stream through
  untouched via union.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Delta-style ``MERGE INTO``: matched keys take the update row's
    values, unmatched update keys insert, unmatched target rows pass
    through. Both relations must share the target's schema; ``updates``
    must be unique per key (pre-collapse multi-row batches with
    :func:`latest_per_key`)."""
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: target={target.columns} updates={updates.columns}"
        )
    # join-side presence marker, NOT a key-is-null check: with eqNullSafe
    # a NULL merge key is a legal value, so key columns can't double as
    # presence detectors
    t = target.alias("t")
    u = updates.withColumn("__u_present", F.lit(True)).alias("u")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"t.{k}").eqNullSafe(F.col(f"u.{k}")) for k in keys],
    )
    matched = F.col("u.__u_present").isNotNull()
    return t.join(u, cond, "full_outer").select(
        *[
            F.when(matched, F.col(f"u.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in target.columns
        ]
    )


def latest_per_key(
    changes: DataFrame, keys: Sequence[str], ts_col: str, tiebreak: str
) -> DataFrame:
    """Collapse a change batch to its single latest row per key (ts desc,
    then ``tiebreak`` desc for a total order)."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak).desc()
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    ts_col: str = "ts",
    eff_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """Apply a change batch to a type-2 slowly-changing dimension.

    ``dim``: (keys, attrs, valid_from, valid_to) with ``valid_to IS NULL``
    marking current rows. ``changes``: (keys, attrs, ts), at most one row
    per key (pre-collapse with :func:`latest_per_key`). Per key:

    - change with different attrs (or a brand-new key): the current row
      closes at the change ts and a new current row opens at it;
    - change with identical attrs: no-op (idempotent re-applies);
    - no change: current row passes through.

    Closed history rows always pass through untouched. Deterministic —
    pure column logic on one keyed join."""
    key_l = list(keys)
    attr_l = list(attrs)
    hist = dim.filter(F.col(end_col).isNotNull())
    # presence markers, not NULL-sentinel columns: a current row with a
    # NULL valid_from (or a change with NULL ts) must not silently vanish
    cur = (
        dim.filter(F.col(end_col).isNull())
        .withColumn("__c_present", F.lit(True))
        .alias("c")
    )
    ch = changes.withColumn("__n_present", F.lit(True)).alias("n")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"c.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key_l],
    )
    j = cur.join(ch, cond, "full_outer")
    has_cur = F.col("c.__c_present").isNotNull()
    has_chg = F.col("n.__n_present").isNotNull()
    differs = reduce(
        lambda a, b: a | b,
        [~F.col(f"c.{a}").eqNullSafe(F.col(f"n.{a}")) for a in attr_l],
    )
    closes = has_cur & has_chg & differs

    def rows(select_from_change: bool):
        src = "n" if select_from_change else "c"
        key_cols = [
            F.coalesce(F.col(f"c.{k}"), F.col(f"n.{k}")).alias(k)
            for k in key_l
        ]
        return key_cols, [F.col(f"{src}.{a}").alias(a) for a in attr_l]

    # surviving current rows: untouched, or no-op change
    k_cols, a_cols = rows(select_from_change=False)
    survive = j.filter(has_cur & (~has_chg | ~differs)).select(
        *k_cols, *a_cols,
        F.col(f"c.{eff_col}").alias(eff_col),
        F.lit(None).cast(dim.schema[end_col].dataType).alias(end_col),
    )
    # closed rows: previous current row ends at the change ts
    closed = j.filter(closes).select(
        *rows(False)[0], *rows(False)[1],
        F.col(f"c.{eff_col}").alias(eff_col),
        F.col(f"n.{ts_col}").cast(dim.schema[end_col].dataType).alias(end_col),
    )
    # new current rows: changed attrs or brand-new key
    opened = j.filter(has_chg & (~has_cur | differs)).select(
        *rows(True)[0], *rows(True)[1],
        F.col(f"n.{ts_col}").cast(dim.schema[eff_col].dataType).alias(eff_col),
        F.lit(None).cast(dim.schema[end_col].dataType).alias(end_col),
    )
    return hist.select(dim.columns).unionByName(survive).unionByName(
        closed
    ).unionByName(opened)
