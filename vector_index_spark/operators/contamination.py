"""Benchmark-contamination detection: n-gram overlap between a training
corpus and an evaluation/benchmark set (north star: eval hygiene for
LLM training data — the standard 8/13-gram decontamination check of
GPT-3 appendix C / PaLM / Llama).

Shape: both sides shingle to DISTINCT word n-grams (Catalyst array
expressions, no Python), the benchmark side's grams deduplicate, and a
single equi-join on the gram key counts overlaps per corpus document.

Scale design (100 TB corpus, small benchmark):
* the join key defaults to ``xxhash64(gram)`` — 8 bytes instead of an
  ~50-byte string through the exchange (collisions: ~2^-64 per pair,
  immaterial to a contamination *ratio*);
* the benchmark side is tiny (eval sets are MBs) — it broadcasts, so
  the corpus never shuffles at all: shingle → broadcast-hash-join →
  partial agg, one pass;
* per-doc output is an aggregation keyed by doc_id, which Catalyst
  map-side combines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_index_spark.functions.text import tokens, word_shingles


def _doc_grams(
    df: DataFrame, n: int, text_col: str, id_col: str, hash_grams: bool
) -> DataFrame:
    grams = word_shingles(tokens(F.col(text_col)), n)
    out = df.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("gram")
    )
    if hash_grams:
        out = out.select("doc_id", F.xxhash64("gram").alias("gram"))
    return out


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = True,
) -> DataFrame:
    """Per corpus document: distinct n-gram count, how many of those
    n-grams appear anywhere in the benchmark, and the contamination
    ratio. Documents with fewer than n tokens have zero grams and report
    ratio 0.0 (nothing to leak).

    Returns (doc_id, n_grams, n_contaminated, contamination_ratio).
    """
    cg = _doc_grams(corpus, n, text_col, id_col, hash_grams)
    bg = (
        _doc_grams(benchmark, n, text_col, id_col, hash_grams)
        .select("gram")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        cg.join(F.broadcast(bg), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("n_contaminated"),
        )
        .join(corpus.select(F.col(id_col).alias("doc_id")), "doc_id", "right")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.round(
                F.coalesce(
                    F.col("n_contaminated") / F.col("n_grams"), F.lit(0.0)
                ),
                6,
            ).alias("contamination_ratio"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    max_ratio: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop corpus documents whose contamination ratio exceeds
    ``max_ratio`` (default: any overlap at all). Returns the surviving
    corpus rows with their original columns."""
    flagged = ngram_contamination(
        corpus, benchmark, n, text_col, id_col
    ).filter(F.col("contamination_ratio") > max_ratio)
    return corpus.join(
        flagged.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    )
