"""Document chunking and sequence packing for training-data pipelines
(north star: context-window preparation at 100 TB).

``chunk_documents`` splits each document into overlapping fixed-size
token windows — entirely with Catalyst array expressions (sequence +
transform + slice + array_join), so the hot path is JVM codegen with no
Python and no shuffle: a pure flatMap-shaped projection that scales
linearly with input splits.

``pack_sequences`` greedily packs documents (in id order) into bins of
at most ``budget`` tokens — the classic sequence-packing step before
tokenized training shards. True greedy packing is a running-reset
recurrence, which no window function expresses; it runs as a per-group
``applyInPandas`` (vectorized cumsum loop) with groups = the
``group_col`` partitions, which is exactly how you shard it on a
cluster: packing is only meaningful within an output shard anyway.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window chunks: (doc_id, chunk_id, n_tokens,
    chunk_text). Windows start at 0, stride, 2*stride, ...; the last
    window is the first grid start that reaches the end of the doc (every
    token is covered; the final window may be short; a doc with at most
    ``chunk_tokens`` tokens yields exactly one chunk).

    Whitespace tokenization (split on runs of whitespace) keeps the
    semantics oracle-checkable; swap ``tokens_expr`` for a BPE pandas UDF
    when a real tokenizer is available.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    n = F.size(ws)
    # last start = (n - chunk) rounded UP to the stride grid: the first
    # grid start whose window reaches the end of the doc (so every token
    # is covered; the final window may be shorter than chunk_tokens)
    overflow = F.greatest(n - F.lit(chunk_tokens), F.lit(0))
    last = (
        F.floor((overflow + F.lit(stride - 1)) / F.lit(stride)) * F.lit(stride)
    ).cast("int")
    starts = F.sequence(F.lit(0), last, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            # slice() is 1-based
            F.array_join(
                F.slice(ws, s + 1, F.lit(chunk_tokens)), " "
            ).alias("chunk_text"),
            F.least(n - s, F.lit(chunk_tokens)).alias("n_tokens"),
        ),
    )
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "c"))
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("c.start").cast("long").alias("start_token"),
            F.col("c.n_tokens").cast("long").alias("n_tokens"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
    )


PACK_SCHEMA = "group string, doc_id long, n_tokens long, bin_id long, bin_pos long"


def pack_sequences(
    df: DataFrame,
    budget: int = 256,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy in-order sequence packing: within each group, walk docs in
    id order keeping a running token count; a doc that would overflow
    ``budget`` closes the bin and opens the next. A doc longer than the
    budget gets a bin of its own (never split, never dropped).

    Returns (group, doc_id, n_tokens, bin_id, bin_pos) — bin_id is dense
    per group, bin_pos the doc's position within its bin. Deterministic:
    a pure function of (group, id-order, token counts)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    sized = df.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(ws).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_id, bin_pos, used = 0, 0, 0
        bins, poss = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if used > 0 and used + n > budget:
                bin_id += 1
                bin_pos, used = 0, 0
            bins.append(bin_id)
            poss.append(bin_pos)
            used += n
            bin_pos += 1
        pdf["bin_id"] = bins
        pdf["bin_pos"] = poss
        return pdf[["group", "doc_id", "n_tokens", "bin_id", "bin_pos"]]

    return sized.groupBy("group").applyInPandas(pack, PACK_SCHEMA)
