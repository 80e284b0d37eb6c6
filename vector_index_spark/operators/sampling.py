"""Deterministic sampling / splitting / mixture operators for
training-data pipelines (north star: dataset curation at 100 TB).

Spark's ``df.sample`` is seeded per-partition, so its output changes with
partitioning — useless for reproducible pipelines and impossible to
oracle-check. These operators instead derive a uniform pseudo-random
value from the row's stable id with a multiplicative (Knuth) hash, so:

* the sample is a pure function of the data — repartition, AQE re-plan,
  or a 1000-executor re-run all return the identical row set;
* the decision is a scan-side Catalyst expression (no shuffle, pushes
  past column pruning, fully codegen'd);
* DuckDB can evaluate the same arithmetic, making every operator
  hash-match oracle-able.

The hash is ``(id * 2654435761 + salt) mod 2^31 / 2^31`` — Knuth's
multiplicative scheme with the golden-ratio constant. It is NOT
cryptographic; it is uniform enough for rate-based selection (tested on
the driver tables) and, critically, identical across engines.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761
MOD = 2**31


def _u01(id_col: Column, salt: int) -> Column:
    """Uniform [0,1) pseudo-random value derived from a stable id."""
    return (
        F.pmod(id_col.cast("long") * F.lit(KNUTH) + F.lit(salt), F.lit(MOD))
        / F.lit(float(MOD))
    )


def u01_sql(id_expr: str, salt: int) -> str:
    """The DuckDB-equivalent expression of ``_u01`` (for oracles)."""
    return (
        f"((({id_expr}) * {KNUTH} + {salt}) % {MOD} + {MOD}) % {MOD} "
        f"/ {float(MOD)}"
    )


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Uniform sample of ~``fraction`` of rows, stable under any
    repartitioning (unlike ``df.sample``). Scan-side filter only."""
    return df.filter(_u01(F.col(id_col), salt) < fraction)


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum rate sampling (e.g. downweight a crawl source, keep all
    of a curated one). ``rates`` maps stratum value -> keep fraction;
    unlisted strata keep ``default_rate``. One scan, no shuffle: the rate
    lookup is a CASE expression, the decision a comparison."""
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, float(r)).otherwise(rate)
    return df.filter(_u01(F.col(id_col), salt) < rate)


def train_val_test_split(
    df: DataFrame,
    fractions: Sequence[float] = (0.8, 0.1, 0.1),
    id_col: str = "doc_id",
    salt: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a split label ('train'/'val'/'test') by cumulative
    hash buckets. Deterministic: the same row lands in the same split on
    every run and at every scale — the property that keeps eval sets
    uncontaminated when the corpus is rebuilt."""
    if len(fractions) != 3 or abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError("fractions must be three values summing to 1")
    u = _u01(F.col(id_col), salt)
    t, v = float(fractions[0]), float(fractions[0] + fractions[1])
    return df.withColumn(
        split_col,
        F.when(u < t, "train").when(u < v, "val").otherwise("test"),
    )


def weighted_mix(
    sources: Mapping[str, DataFrame],
    weights: Mapping[str, float],
    id_col: str = "doc_id",
    salt: int = 0,
    mix_col: str = "mix_source",
    order_col: str = "mix_order",
) -> DataFrame:
    """Dataset mixture: sample each named source at its weight, tag the
    provenance, and assign a deterministic global interleave key (the
    hash itself) so a downstream ``ORDER BY mix_order`` shuffles sources
    together uniformly — the "data mixing" stage of an LLM pipeline,
    without a random shuffle's irreproducibility.

    Each source is sampled scan-side; the union is a no-shuffle
    UnionExec. The interleave ORDER BY is the only exchange, and at
    export time it is the range partitioner you want anyway for
    fixed-size training shards."""
    parts = []
    for name, sdf in sorted(sources.items()):
        w = float(weights.get(name, 0.0))
        u = _u01(F.col(id_col), salt)
        parts.append(
            sdf.filter(u < w).select(
                F.lit(name).alias(mix_col),
                F.col(id_col).alias(id_col),
                F.round(_u01(F.col(id_col), salt + 1), 9).alias(order_col),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def take_n_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Exact-count stratified sampling: exactly ``min(n, |stratum|)`` rows
    per group, chosen by portable-hash order (ties broken by id) — the
    eval-set construction primitive ("1000 docs per source"), deterministic
    under any partitioning and recomputable bit-for-bit in SQL.

    One window over the group key; rank-k selection is map-side-limited by
    Spark's WindowGroupLimit before the exchange, so shuffle volume is
    O(groups * n * partitions), not the corpus. Hash-ordering (not "first
    n") avoids the scan-order bias of prefix sampling — row order usually
    correlates with content (crawl order, time)."""
    from pyspark.sql import Window

    from vector_index_spark.functions.hashing import portable_hash

    h = portable_hash(F.col(id_col).cast("string"), seed=seed)
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
