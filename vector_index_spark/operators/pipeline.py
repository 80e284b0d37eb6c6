"""Composite training-data cleaning pipeline — the operators composed the
way a real 100 TB corpus-prep job composes them (north star,
BASELINE.json):

    quality filter  ->  exact (fingerprint) dedup  ->  MinHash near-dup
    removal  ->  per-source corpus stats

Each stage is one of this engine's first-class operators; the pipeline is
one lazy DataFrame graph, so Catalyst sees the whole thing (the quality
filter prunes rows BEFORE any dedup hashing happens — filter-first is the
pipeline's own predicate pushdown)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_index_spark.functions.text import fingerprint, quality_score, tokens
from vector_index_spark.operators.dedup import minhash_near_dup


def clean_corpus(
    docs: DataFrame,
    quality_threshold: float = 0.55,
    jaccard_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Surviving documents after quality + exact-dup + near-dup filtering.

    Survivor rule (deterministic): below-threshold quality drops the row;
    within an identical-fingerprint group only min id survives; for each
    verified near-dup pair the larger id drops. Returns the surviving rows
    of ``docs`` (all original columns).
    """
    scored = docs.withColumn("__q", quality_score(F.col(text_col))).filter(
        F.col("__q") >= quality_threshold
    )
    # exact dedup: min id per normalized-text fingerprint
    keep_exact = (
        scored.select(F.col(id_col).alias("__id"), fingerprint(F.col(text_col)).alias("__fp"))
        .groupBy("__fp")
        .agg(F.min("__id").alias(id_col))
        .select(id_col)
    )
    exact_survivors = docs.join(keep_exact, id_col)
    # near-dup removal among exact survivors: drop the larger id of each pair
    pairs = minhash_near_dup(
        exact_survivors,
        text_col=text_col,
        id_col=id_col,
        jaccard_threshold=jaccard_threshold,
    )
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return exact_survivors.join(drop, id_col, "left_anti")


def corpus_stats(
    survivors: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Per-group corpus statistics after cleaning: doc count, token total,
    mean chars — the numbers a data pipeline reports per shard/source."""
    return survivors.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col(text_col)))).cast("long").alias("n_tokens"),
        F.round(F.avg(F.length(text_col)), 6).alias("avg_chars"),
    )
