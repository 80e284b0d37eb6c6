"""Distributed BPE (byte-pair-encoding) vocabulary training and corpus
tokenization (Sennrich et al. 2016) — the tokenizer-training operator a
training-data pipeline runs before token counting is meaningful.

The reference has no text surface at all (SURVEY §1.2: float32 vectors
only); this is north-star breadth, the companion to
``operators/textstats.token_counts``'s fixed BPE-ish regex: here the
vocabulary is LEARNED from the corpus.

Scale shape (100 TB corpus, how real trainers split the work):
- The corpus-sized stage is ONE distributed word-count aggregate
  (tokenize → explode → groupBy word). Map-side partial aggregation
  collapses each task to its distinct words before the single shuffle.
- The merge LOOP runs on the distinct-word histogram, which is bounded
  (Heaps' law; additionally capped by ``min_freq`` + ``max_words`` via
  a TakeOrdered, never a full sort) — kilobytes-to-MBs on the driver
  regardless of corpus size. Running it distributed would cost one
  shuffle per merge; running it on the histogram costs zero. This is
  the same split HuggingFace ``tokenizers``/SentencePiece use.
- Applying the learned merges back to the corpus is map-only: the merge
  table broadcasts (KBs) and an Arrow-batched pandas UDF tokenizes with
  a per-batch word→tokens memo (Zipf makes the memo hit rate ~99%).

Determinism: merge selection breaks count ties lexicographically, so
the learned vocabulary is a pure function of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_index_spark.functions.text import tokens

END = "</w>"  # end-of-word sentinel: lets merges learn suffixes ("est</w>")


def word_histogram(
    df: DataFrame,
    text_col: str = "text",
    min_freq: int = 2,
    max_words: int = 1_000_000,
) -> list[tuple[str, int]]:
    """The one corpus-scale stage: distinct-word counts, frequency-
    pruned and capped to ``max_words`` by (count desc, word) so the
    driver collect is bounded. Returns [(word, count)] sorted the same
    way (deterministic input order for the merge loop)."""
    wc = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_freq)
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
    )
    return [(r["w"], r["c"]) for r in wc.collect()]


def learn_merges(
    histogram: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Driver-side BPE merge loop over the word histogram.

    Incremental pair-count maintenance: a merge only touches the words
    that contain its pair, so each round costs O(words containing the
    winning pair), not O(all words). Ties break (count desc, pair lex).
    Stops early when no pair occurs twice."""
    words: list[list[str]] = [list(w) + [END] for w, _ in histogram]
    counts = [c for _, c in histogram]
    pair_freq: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def _add(pair: tuple[str, str], wi: int, c: int) -> None:
        pair_freq[pair] = pair_freq.get(pair, 0) + c
        pair_words.setdefault(pair, set()).add(wi)

    def _sub(pair: tuple[str, str], c: int) -> None:
        pair_freq[pair] -= c

    for wi, syms in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            _add((a, b), wi, counts[wi])

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        for pair, freq in pair_freq.items():
            if freq < 2:
                continue
            key = (-freq, pair)
            if best is None or key < best[0]:
                best = (key, pair)
        if best is None:
            break
        pair = best[1]
        merges.append(pair)
        merged = pair[0] + pair[1]
        for wi in list(pair_words.get(pair, ())):
            syms, c = words[wi], counts[wi]
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    if out:
                        _sub((out[-1], syms[i]), c)
                        _add((out[-1], merged), wi, c)
                    if i + 2 < len(syms):
                        _sub((syms[i + 1], syms[i + 2]), c)
                        # the (merged, next) pair is added when the loop
                        # visits ``next`` (or the next merge site)
                    out.append(merged)
                    _sub(pair, c)
                    i += 2
                    if i < len(syms):
                        _add((merged, syms[i]), wi, c)
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
        pair_freq.pop(pair, None)
        pair_words.pop(pair, None)
    return merges


def train_bpe(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_freq: int = 2,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """One-call train: histogram (distributed) + merge loop (driver)."""
    return learn_merges(
        word_histogram(df, text_col, min_freq, max_words), num_merges
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [END]
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Map-only tokenization: lowest-rank-first merge application per
    word (the standard BPE encoder), Arrow-batched, with a per-batch
    word→tokens memo. Appends ``out_col: array<string>``."""
    ranks = {p: i for i, p in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast(ranks)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _enc(words_s):  # Series of array<string> (pre-split words)
        rk = bc.value
        memo: dict[str, list[str]] = {}

        def enc_doc(words):
            out: list[str] = []
            for w in words:
                t = memo.get(w)
                if t is None:
                    t = _encode_word(w, rk)
                    memo[w] = t
                out.extend(t)
            return out

        return words_s.map(enc_doc)

    return df.withColumn(out_col, _enc(tokens(F.col(text_col))))


def merges_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """Learned merge table as (rank, left, right) — the persistable
    vocabulary artifact."""
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )
