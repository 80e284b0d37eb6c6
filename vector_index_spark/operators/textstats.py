"""Document-level text analysis operators (north star: text analysis for
training-data pipelines): token statistics, quality scoring, language ID,
token frequency tables. All pure Catalyst expressions over
``functions.text`` — no Python in the hot path."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_index_spark.functions.text import (
    ENGLISH_STOPWORDS,
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


# ---------------------------------------------------------------------------
# Training-data curation: PII redaction, repetition, Gopher-style filters
# ---------------------------------------------------------------------------

# Portable regex subset (identical semantics in Java regex and RE2):
# character classes, bounded repetition, \b word boundaries.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\b[0-9]{3}-[0-9]{4}\\b"


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Replace email addresses and phone-shaped numbers with typed
    placeholders, and count what was removed. Pure scan-side
    ``regexp_replace`` / ``regexp_extract_all`` — no shuffle, codegen'd,
    the standard first pass of a training-data cleaning pipeline."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("redacted"),
    )


def _bigrams(toks: Column) -> Column:
    """Space-joined adjacent token pairs. zip_with pads the short side with
    null and concat propagates it, so the trailing partial pair drops out in
    the filter — the same contract as DuckDB's list_zip + ||."""
    return F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda x: x.isNotNull(),
    )


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition metrics (the Gopher/C4 repetition family):
    fraction of duplicate tokens and of duplicate adjacent bigrams. High
    values flag boilerplate and degenerate generations."""
    toks = tokens(F.col(text_col))
    bi = _bigrams(toks)

    def dup_ratio(arr: Column) -> Column:
        n = F.size(arr)
        return F.when(n <= 0, F.lit(0.0)).otherwise(
            1.0 - F.size(F.array_distinct(arr)) / n
        )

    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(dup_ratio(toks), 6).alias("dup_token_ratio"),
        F.round(dup_ratio(bi), 6).alias("dup_bigram_ratio"),
    )


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 12.0,
    max_dup_token_ratio: float = 0.9,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, "Scaling
    Language Models", appendix A1.1 — public paper), thresholds adapted to
    the synthetic corpus: token-count window, mean-token-length window,
    duplicate-token cap, minimum distinct-stopword hits. Emits each rule
    flag plus the conjunction, all as one scan-side projection."""
    t = F.col(text_col)
    toks = tokens(t)
    n = F.size(toks)
    mean_len = mean_token_length(toks)
    dup = F.when(n <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(toks)) / n
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in ENGLISH_STOPWORDS]),
        )
    )
    ok_tokens = (n >= min_tokens) & (n <= max_tokens)
    ok_len = (mean_len >= min_mean_token_len) & (mean_len <= max_mean_token_len)
    ok_dup = dup <= max_dup_token_ratio
    ok_stop = stop_hits >= min_stopword_hits
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        ok_tokens.alias("ok_token_count"),
        ok_len.alias("ok_mean_token_len"),
        ok_dup.alias("ok_repetition"),
        ok_stop.alias("ok_stopwords"),
        (ok_tokens & ok_len & ok_dup & ok_stop).alias("keep"),
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2 rules, the
    public heuristics): keep only lines that end in terminal punctuation
    (. ! ? ") and have >= ``min_line_words`` words and do not mention
    'javascript'; drop whole documents containing '{' or 'lorem ipsum'
    or keeping fewer than ``min_kept_lines`` lines.

    Returns (doc_id, n_lines, n_kept, keep, clean_text): clean_text is
    the kept lines rejoined with newlines ('' when the doc is dropped).
    One scan-side projection — split / filter / rejoin are Catalyst array
    expressions; deliberately regex-free (endswith / contains / size) so
    any SQL engine replays the exact decisions."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    words = lambda x: F.size(F.filter(F.split(x, " "), lambda w: w != ""))  # noqa: E731
    good = lambda x: (  # noqa: E731
        (
            F.endswith(x, F.lit("."))
            | F.endswith(x, F.lit("!"))
            | F.endswith(x, F.lit("?"))
            | F.endswith(x, F.lit('"'))
        )
        & (words(x) >= min_line_words)
        & ~F.contains(F.lower(x), F.lit("javascript"))
    )
    kept = F.filter(lines, good)
    doc_ok = (
        ~F.contains(F.lower(t), F.lit("lorem ipsum"))
        & ~F.contains(t, F.lit("{"))
        & (F.size(kept) >= min_kept_lines)
    )
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        doc_ok.alias("keep"),
        F.when(doc_ok, F.array_join(kept, "\n")).otherwise("").alias("clean_text"),
    )


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-trained bigram language-model score per document — the
    relational analogue of the KenLM perplexity quality filter
    (CCNet-style): low average log-probability flags boilerplate and
    gibberish against the corpus's own token distribution.

    Model: P(w2|w1) = (C(w1,w2) + 1) / (C(w1) + V), add-one smoothed,
    where counts come from the SAME corpus (self-scoring, the usual
    first pass before an external LM exists). Score = mean ln P over the
    doc's bigrams; docs with no bigram are dropped.

    Plan shape at 100 TB: the bigram explode is a Generate (no shuffle);
    the count tables shuffle once on their keys; scoring joins doc
    bigrams to the count tables on the bigram/unigram keys — shuffle
    joins on uniformly-hashed token keys, AQE splitting the stopword
    bigrams' skew. No driver state, no vocabulary collect.

    Returns (doc_id, n_bigrams, avg_logprob) — logprob rounded to 6.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
            lambda x: x != "",
        ).alias("ws"),
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("ws") - 2),
                    lambda i: F.struct(
                        F.element_at("ws", i + 1).alias("w1"),
                        F.element_at("ws", i + 2).alias("w2"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    unigrams = toks.select("doc_id", F.explode("ws").alias("w1"))

    c2 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = unigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = unigrams.select("w1").distinct().count()

    scored = (
        bigrams.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .select(
            "doc_id",
            F.log((F.col("c2") + 1.0) / (F.col("c1") + F.lit(float(v)))).alias(
                "lp"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )
