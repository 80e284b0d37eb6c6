"""Skew mitigation helpers — salting for hot keys.

AQE's skew-join handling covers sort-merge joins automatically
(spark.sql.adaptive.skewJoin.enabled, on in our session factory); salting
is the explicit tool for skewed AGGREGATIONS and for joins where one key
dominates (the classic null-key / power-law-id problem at 100 TB).

``salted_agg`` demonstrates the two-phase pattern: each hot key spreads
over ``n_salts`` sub-keys (the partial agg shuffles n_salts-way instead of
into one hot partition), then partials merge per key. Results are
identical to a direct groupBy — only the shuffle distribution changes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt derived from a stable row hash, NOT rand():
    deterministic salting keeps results reproducible and retry-safe (a
    re-executed task must salt identically or shuffle retries would
    redistribute rows)."""
    first = F.coalesce(F.col(df.columns[0]).cast("string"), F.lit(""))
    return df.withColumn(salt_col, F.pmod(F.xxhash64(first), F.lit(n_salts)))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big (skewed) side gets a deterministic salt,
    the small side is replicated ``n_salts``-way, and the join key becomes
    (key, salt) — a hot key's rows spread over ``n_salts`` partitions
    instead of landing on one straggler task. Results are identical to
    ``big.join(small, on, how)``.

    Replication multiplies the small side by ``n_salts``, so this is for
    small-but-not-broadcastable right sides (a broadcast join needs no
    salting — there is no shuffle to skew). Supports inner and left joins
    (the salted right side would duplicate right-outer dangling rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # salt from a whole-row hash, NOT the key: a key-derived salt would
    # send every row of a hot key to the same sub-key again. Row-hash is
    # deterministic (retry-safe) and spreads a hot key's rows because the
    # non-key columns differ.
    salted = big.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit(""))
                         for c in big.columns]),
            F.lit(n_salts),
        ),
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    joined = salted.join(replicated, [on, "__salt"], how)
    return joined.drop("__salt")


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[Column, Callable[[Column], Column]]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over (possibly) skewed group keys.

    ``aggs`` maps output name -> (partial aggregate expression, merge
    function over the partial column), e.g.::

        salted_agg(df, ["k"], {
            "n":   (F.count(F.lit(1)), F.sum),
            "s":   (F.sum("v"),        F.sum),
            "mx":  (F.max("v"),        F.max),
        })
    """
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        *[partial.alias(f"__p_{name}") for name, (partial, _) in aggs.items()]
    )
    return phase1.groupBy(*group_cols).agg(
        *[merge(F.col(f"__p_{name}")).alias(name) for name, (_, merge) in aggs.items()]
    )
