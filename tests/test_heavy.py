"""Two-pass exact heavy hitters: exactness vs plain groupBy, the
no-miss guarantee under adversarial partitioning, summary boundedness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from vector_index_spark.operators.heavy import (
    _mg_summaries,
    heavy_hitters,
    heavy_tokens,
)


def _exact(items, frac):
    n = items.count()
    return {
        (r["item"], r["cnt"])
        for r in items.groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > frac * n)
        .collect()
    }


def test_matches_exact_on_zipf(spark):
    # Zipf-ish: item i appears ~3000/i times
    rows = [(f"w{i}",) for i in range(1, 200) for _ in range(3000 // i)]
    items = spark.createDataFrame(rows, "item string").repartition(16)
    got = {(r["item"], r["cnt"]) for r in heavy_hitters(items, 0.01).collect()}
    assert got == _exact(items, 0.01)
    assert len(got) > 5


def test_no_miss_with_adversarial_partitioning(spark):
    """The heavy item is diluted across partitions full of unique noise
    (the regime that evicts counters); MG must still surface it."""
    rows = [("hot",)] * 500 + [(f"noise{i}",) for i in range(20_000)]
    items = spark.createDataFrame(rows, "item string").repartition(32)
    got = {r["item"] for r in heavy_hitters(items, 0.02).collect()}
    assert got == {"hot"}


def test_summaries_bounded(spark):
    rows = [(f"x{i}",) for i in range(50_000)]
    items = spark.createDataFrame(rows, "item string").repartition(8)
    per_part = (
        _mg_summaries(items, capacity=100)
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    assert all(r["count"] <= 100 for r in per_part)


def test_heavy_tokens_matches_duckdb(spark, duck):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    got = {(r["token"], r["cnt"]) for r in heavy_tokens(docs, 0.005).collect()}
    want = set(
        duck.execute(
            f"""
        WITH toks AS (
          SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                        x -> x <> '')) AS token
          FROM read_parquet('{SF_CORRECT}/documents.parquet')
        ), n AS (SELECT count(*) AS n FROM toks)
        SELECT token, count(*) AS cnt FROM toks, n
        GROUP BY token, n.n HAVING count(*) > 0.005 * n.n
        """
        ).fetchall()
    )
    assert got == want and len(got) > 0
