"""Text-analysis primitives for the LLM-data-pipeline operators
(BASELINE.json north star): tokenization, shingling, quality metrics,
language-ID scoring, fingerprinting.

Everything here is a pure Catalyst expression (JVM-side, codegen-friendly);
no Python UDFs. Every function has an exact DuckDB-SQL twin used by the
oracles, so regexes are kept to the portable subset (character classes only,
identical semantics in Java regex and RE2-ish engines).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_index_spark.functions.hashing import portable_hash

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Tiny fixed stopword lists for the language-ID heuristic. Deliberately
# minimal: language ID here is an n-gram/stopword scoring *pattern* — on a
# real corpus you'd swap in real frequency tables; the operator shape
# (per-language score -> deterministic argmax) is what matters.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en": ("the", "a", "of", "and", "to", "is", "in"),
    "es": ("el", "los", "las", "una", "que", "y", "es"),
    "fr": ("le", "les", "des", "et", "est", "une", "dans"),
}

ENGLISH_STOPWORDS = LANG_STOPWORDS["en"]


def tokens(text: Column) -> Column:
    """Lowercased alphanumeric tokens, empties dropped."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def word_shingles(toks: Column, k: int) -> Column:
    """Distinct k-word shingles (space-joined). Rows with < k tokens yield
    an empty array. (Guard: Spark's sequence(1, 0) is DESCENDING [1, 0],
    so short rows must short-circuit to an empty array.)"""
    n = F.size(toks) - F.lit(k - 1)
    return F.when(n < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.array_join(F.slice(toks, i, k), " "),
            )
        )
    )


def char_ngrams(text: Column, n: int) -> Column:
    """Distinct character n-grams of the lowercased text. Same descending-
    sequence guard as :func:`word_shingles`."""
    s = F.lower(text)
    cnt = F.length(s) - F.lit(n - 1)
    return F.when(cnt < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), cnt), lambda i: F.substr(s, i, F.lit(n)))
        )
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_ratio(toks: Column, stopwords: tuple[str, ...] = ENGLISH_STOPWORDS) -> Column:
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*stopwords))
    )
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not lowercase-alphanumeric or space
    (computed on the lowercased text)."""
    s = F.lower(text)
    non_alnum = F.length(s) - F.length(F.regexp_replace(s, "[^a-z0-9 ]", ""))
    return non_alnum / F.greatest(F.length(s), F.lit(1))


def mean_token_length(toks: Column) -> Column:
    total = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Deterministic [0, 1] quality heuristic: rewards reasonable length and
    stopword density, penalizes punctuation soup. The standard cheap
    pre-filter shape for training-data pipelines (cf. C4/Gopher rules)."""
    toks = tokens(text)
    length_term = F.least(F.size(toks) / F.lit(64.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(toks) * F.lit(4.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * F.lit(4.0), F.lit(1.0))
    return (length_term + stop_term + punct_term) / F.lit(3.0)


def lang_scores(toks: Column) -> list[tuple[str, Column]]:
    """Per-language stopword-hit fraction."""
    return [(lang, stopword_ratio(toks, words)) for lang, words in LANG_STOPWORDS.items()]


ROLLING_BASE = 257
ROLLING_MOD = 2_147_483_647  # 2^31 - 1: products stay < 2^40, exact in float64


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling hash over the code points of the normalized
    lowercase text: h = fold(h * 257 + cp) mod (2^31 - 1). The modulus is
    chosen so every intermediate fits float64 exactly — the hash is
    bit-identical in any engine with 64-bit arithmetic, including the
    DuckDB oracle (list_reduce twin)."""
    normalized = F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))
    chars = F.split(normalized, "")
    cps = F.transform(F.filter(chars, lambda c: c != F.lit("")), F.ascii)
    return F.aggregate(
        cps,
        F.lit(0).cast("long"),
        lambda acc, cp: (acc * ROLLING_BASE + cp.cast("long")) % ROLLING_MOD,
    )


def fingerprint(text: Column) -> Column:
    """48-bit portable fingerprint of the whitespace-normalized lowercase
    text — the exact-dedup key (content-defined, not formatting-sensitive)."""
    normalized = F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))
    return portable_hash(normalized)


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """Array of ``num_hashes`` min-hashes over the shingle set, using the
    seeded portable hash family. Empty shingle set -> nulls (filter first)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(
            F.transform(
                shingles,
                lambda s: F.conv(
                    F.substring(
                        F.md5(F.concat(seed.cast("string"), F.lit(":"), s)), 1, 12
                    ),
                    16,
                    10,
                ).cast("long"),
            )
        ),
    )


def word_shingles_udf(k: int):
    """Arrow-batched pandas UDF computing the SAME distinct k-word shingles
    as tokens() + word_shingles() (value-identical; regex semantics of
    ``[^a-z0-9]+`` agree across Python re / Java regex / DuckDB RE2). The
    hot-path implementation for dedup operators: interpreted Catalyst
    higher-order expressions cost ~20ms/doc for shingling, Python ~0.1ms."""
    import re

    from pyspark.sql.functions import pandas_udf

    split = re.compile(TOKEN_SPLIT_RE)

    @pandas_udf("array<string>")
    def sh(text_col: pd.Series) -> pd.Series:
        def one(text: str) -> list[str]:
            toks = [t for t in split.split(text.lower()) if t]
            if len(toks) < k:
                return []
            seen: dict[str, None] = {}
            for i in range(len(toks) - k + 1):
                seen.setdefault(" ".join(toks[i : i + k]), None)
            return list(seen)

        return text_col.map(one)

    return sh


def simhash_udf(bits: int = 48):
    """Arrow-batched pandas UDF computing the SAME 48-bit simhash as
    :func:`simhash` over tokenized text (value-identical; verified by the
    q14 oracle). Hot-path implementation: the Catalyst form evaluates
    bits x tokens interpreted expressions per row."""
    import hashlib
    import re

    from pyspark.sql.functions import pandas_udf

    split = re.compile(TOKEN_SPLIT_RE)

    import numpy as np

    # the vectorized vote tally packs bit weights into int64 (ADVICE
    # r15): 1 << 63 would overflow and the md5 token hash below is
    # 48-bit anyway, so wider simhashes need a different hash first
    if not 1 <= bits <= 62:
        raise ValueError(f"bits must be in [1, 62] (int64 weights), got {bits}")
    shifts = np.arange(bits, dtype=np.int64)
    weights = np.int64(1) << shifts

    @pandas_udf("long")
    def sh(text_col: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def one(text: str) -> int:
            toks = {t for t in split.split(text.lower()) if t}
            if not toks:
                return 0
            hs = np.empty(len(toks), dtype=np.int64)
            for i, t in enumerate(toks):
                h = cache.get(t)
                if h is None:
                    h = int.from_bytes(hashlib.md5(t.encode()).digest()[:6], "big")
                    cache[t] = h
                hs[i] = h
            # votes[b] = (#set bits) - (#unset) = 2*ones - n; bit b of the
            # result is set iff votes[b] > 0 — exact integer arithmetic,
            # value-identical to the per-token/per-bit loop it replaces
            # (round 15: that loop was bits x tokens Python ops per row)
            ones = ((hs[:, None] >> shifts) & 1).sum(axis=0)
            return int(weights[2 * ones > len(toks)].sum())

        return text_col.map(one)

    return sh


def simhash(toks: Column, bits: int = 48) -> Column:
    """SimHash over the distinct token set: bit b of the result is 1 iff the
    majority of token hashes have bit b set (ties -> 0). 48 bits so the
    value stays positive in int64 and matches the DuckDB oracle exactly."""
    hashes = F.transform(F.array_distinct(toks), lambda t: portable_hash(t))
    # per-bit vote sums: for each token hash, +1 if bit b set else -1.
    # Bit extraction via floor(h / 2^b) % 2 — division by a power of two is
    # exact in float64 for 48-bit hashes, and the same expression runs
    # verbatim in the DuckDB oracle.
    sums = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda b: F.floor(h / F.pow(F.lit(2.0), b)).cast("long") % 2 * 2 - 1,
            ),
            lambda a, v: a + v,
        ),
    )
    return F.aggregate(
        F.zip_with(
            sums,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda s, b: F.when(s > 0, F.pow(F.lit(2.0), b).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
