"""BPE vocabulary training: hand-computed merges on the classic toy
corpus, encode/train consistency, determinism, round-trip."""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT
from vector_index_spark.operators.bpe import (
    END,
    apply_bpe,
    learn_merges,
    train_bpe,
    word_histogram,
)


def test_learn_merges_hand_computed():
    # Sennrich et al.'s example histogram (hug/pug/pun/bun/hugs family)
    hist = [("hug", 10), ("pug", 5), ("pun", 12), ("bun", 4), ("hugs", 5)]
    merges = learn_merges(hist, 6)
    # round 1: ("u","g")=20 wins outright
    # round 2: ("u","n")=16 ties ("n",END)=16 -> lex gives ("n",END)
    # round 3: ("u","n</w>")=16 wins
    # round 4: ("h","ug")=15 ties ("ug",END)=15 -> lex gives ("h","ug")
    assert merges[:4] == [("u", "g"), ("n", END), ("u", "n" + END), ("h", "ug")]


def test_learn_merges_tie_breaks_lexicographic():
    hist = [("ab", 3), ("cd", 3)]
    # ("a","b")=3 ties ("c","d")=3 and both tie their END pairs; lex wins
    merges = learn_merges(hist, 1)
    assert merges[0] == ("a", "b")


def test_incremental_counts_match_rescan():
    """The incremental pair-count maintenance must agree with a naive
    recount-from-scratch implementation on overlap-heavy words."""
    hist = [("aaaa", 7), ("abab", 5), ("banana", 3), ("bb", 2)]

    def naive(hist, n):
        words = {i: (list(w) + [END], c) for i, (w, c) in enumerate(hist)}
        merges = []
        for _ in range(n):
            freq: dict = {}
            for syms, c in words.values():
                for p in zip(syms, syms[1:]):
                    freq[p] = freq.get(p, 0) + c
            live = {p: f for p, f in freq.items() if f >= 2}
            if not live:
                break
            pair = min(live, key=lambda p: (-live[p], p))
            merges.append(pair)
            for i, (syms, c) in words.items():
                out, j = [], 0
                while j < len(syms):
                    if j + 1 < len(syms) and (syms[j], syms[j + 1]) == pair:
                        out.append(syms[j] + syms[j + 1])
                        j += 2
                    else:
                        out.append(syms[j])
                        j += 1
                words[i] = (out, c)
        return merges

    assert learn_merges(hist, 10) == naive(hist, 10)


def test_train_and_apply_on_corpus(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    merges = train_bpe(docs, num_merges=50, min_freq=2)
    assert len(merges) == 50
    # deterministic: same corpus -> same merges
    assert train_bpe(docs, num_merges=50, min_freq=2) == merges

    enc = apply_bpe(docs.limit(20), merges).select("doc_id", "text", "bpe_tokens")
    rows = enc.collect()
    assert len(rows) == 20
    from vector_index_spark.functions.text import tokens as tok_col
    import pyspark.sql.functions as F

    words = {
        r["doc_id"]: r["w"]
        for r in docs.limit(20).select("doc_id", tok_col(F.col("text")).alias("w")).collect()
    }
    for r in rows:
        # round-trip: concatenating tokens and splitting on END recovers
        # exactly the original lowercased word sequence
        joined = "".join(r["bpe_tokens"])
        assert joined == "".join(w + END for w in words[r["doc_id"]])


def test_histogram_bounded_and_sorted(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    hist = word_histogram(docs, max_words=20)
    assert len(hist) == 20
    counts = [c for _, c in hist]
    assert counts == sorted(counts, reverse=True)
    assert min(counts) >= 2


def test_q97_oracle_pin_matches_fresh_training(spark):
    """The q97 oracle pins the deterministic sf0.01 merge table
    (__spark_entry__._Q97_MERGES); retrain and assert the pin is fresh so
    it can never silently drift from the corpus."""
    from __spark_entry__ import _Q97_MERGES
    from vector_index_spark.operators.bpe import train_bpe
    from tests.conftest import SF_CORRECT

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    assert train_bpe(docs, num_merges=40, min_freq=2) == _Q97_MERGES
