"""Exactness + plan gates for the blocked near-dup rewrites.

Both simhash_near_dup (pigeonhole banding) and embedding_near_dup
(triangle-inequality cell blocking) claim EXACT equivalence to the naive
all-pairs scan while keeping cross joins out of the physical plan — both
claims are asserted here (VERDICT r01 "What's wrong" #1/#2).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from vector_index_spark.functions.distance import cos_dist
from vector_index_spark.functions.text import simhash_udf, tokens
from vector_index_spark.operators.dedup import embedding_near_dup, simhash_near_dup

BAD_JOINS = ("CartesianProduct", "BroadcastNestedLoopJoin")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_CORRECT}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")


def test_simhash_banding_matches_all_pairs(spark, docs):
    banded = simhash_near_dup(docs, hamming_radius=6)
    sh = (
        docs.select(F.col("doc_id").alias("id"), F.col("text").alias("t"))
        .filter(F.size(tokens(F.col("t"))) > 0)
        .select("id", simhash_udf()(F.col("t")).alias("sh"))
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= 6)
        .select("id_a", "id_b", "hamming")
    )
    assert banded.exceptAll(brute).count() == 0
    assert brute.exceptAll(banded).count() == 0


def test_simhash_plan_is_equi_join(docs):
    plan = _plan(simhash_near_dup(docs))
    for bad in BAD_JOINS:
        assert bad not in plan, f"{bad} in simhash plan:\n{plan}"


def test_simhash_radius_wider_than_bits_rejected(docs):
    with pytest.raises(ValueError, match="bands"):
        simhash_near_dup(docs, hamming_radius=48)


@pytest.mark.parametrize("threshold", [0.2, 0.65])
def test_embedding_cells_match_all_pairs(spark, emb, threshold):
    celled = embedding_near_dup(emb, cos_threshold=threshold).select(
        "id_a", "id_b", F.round("cos", 6).alias("cos")
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("v_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("v_b"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos_dist(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos") < threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )
    assert celled.exceptAll(brute).count() == 0
    assert brute.exceptAll(celled).count() == 0


def test_embedding_plan_is_equi_join(emb):
    plan = _plan(embedding_near_dup(emb, cos_threshold=0.65))
    for bad in BAD_JOINS:
        assert bad not in plan, f"{bad} in embedding plan:\n{plan}"


def test_embedding_no_duplicate_pairs(emb):
    res = embedding_near_dup(emb, cos_threshold=0.65)
    assert res.count() == res.dropDuplicates(["id_a", "id_b"]).count()
