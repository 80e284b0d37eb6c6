"""Document-level text analysis operators (north star: text analysis for
training-data pipelines): token statistics, quality scoring, language ID,
token frequency tables. All pure Catalyst expressions over
``functions.text`` — no Python in the hot path."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_index_spark.functions.text import (
    LANG_STOPWORDS,
    mean_token_length,
    punct_ratio,
    quality_score,
    stopword_ratio,
    tokens,
)


def text_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document quality profile: token count, char count, punctuation /
    stopword ratios, mean token length, composite quality score."""
    t = F.col(text_col)
    toks = tokens(t)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(t).cast("long").alias("n_chars"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(toks), 6).alias("stopword_ratio"),
        F.round(mean_token_length(toks), 6).alias("mean_token_len"),
        F.round(quality_score(t), 6).alias("quality"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-profile language ID: per-language hit fraction, argmax with
    (score DESC, lang ASC) tiebreak. Returns (id, lang_pred, lang_score)."""
    toks = tokens(F.col(text_col))
    scored = df.select(
        F.col(id_col),
        F.array(
            *[
                F.struct(
                    F.round(stopword_ratio(toks, words), 6).alias("score"),
                    F.lit(lang).alias("lang"),
                )
                for lang, words in sorted(LANG_STOPWORDS.items())
            ]
        ).alias("scores"),
    )
    # argmax with deterministic tiebreak: sort by (-score, lang), take first
    best = F.array_sort(
        F.col("scores"),
        lambda l, r: F.when(l.score > r.score, -1)
        .when(l.score < r.score, 1)
        .when(l.lang < r.lang, -1)
        .when(l.lang > r.lang, 1)
        .otherwise(0),
    )[0]
    return scored.select(
        F.col(id_col),
        best.lang.alias("lang_pred"),
        best.score.alias("lang_score"),
    )


BPE_ISH_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document token counts under two tokenizations: whitespace-ish
    (alnum runs) and a BPE-ish regex (letter runs | digit runs | punct runs
    — the shape of GPT-2's pre-tokenizer, portable regex subset). The cheap
    budget estimator for training-data pipelines."""
    t = F.lower(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_RE), F.lit(0)))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def token_frequencies(
    df: DataFrame, text_col: str = "text", top_n: int | None = None
) -> DataFrame:
    """Corpus-wide token frequency table ordered (count DESC, token ASC);
    classic explode -> groupBy shape with map-side partial aggregation."""
    freq = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    ordered = freq.orderBy(F.col("n").desc(), F.col("token").asc())
    return ordered.limit(top_n) if top_n else ordered
