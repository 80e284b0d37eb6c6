"""Binary-embedding (Hamming-space) similarity: sign-bit binarization,
word packing, and exact Hamming kNN — entirely Catalyst expressions.

Why this exists at 100 TB: a float32 embedding column is 4 bytes/dim;
its sign-bit binarization is 1 BIT/dim (32x smaller) and, for
mean-centered embedding families, Hamming distance on the signs tracks
cosine distance well enough for shortlist retrieval (Charikar 2002 —
the same hyperplane-LSH bound simhash uses). The packed form turns a
64-dim vector into two 32-bit words; the distance kernel is
``bit_count(a XOR b)`` — integer ops inside whole-stage codegen, no
Python, no floats, ~2 longs read per comparison instead of 64 doubles.

Packing uses a Horner fold (``acc*2 + bit``) rather than shifts, so the
same arithmetic is expressible in any SQL dialect (the DuckDB oracle
replays it with powers of two); 32 bits per word keeps every
intermediate exact in both int64 and float64 arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

WORD_BITS = 32


def binarize_pack(vec: Column, dim: int) -> Column:
    """Sign-bit binarize a float vector and pack into 32-bit words
    (array<long>, ceil(dim/32) entries; bit for dimension i sits in word
    i//32 with weight 2^(31 - i%32); trailing dims of a short final word
    are zero-padded)."""
    n_words = (dim + WORD_BITS - 1) // WORD_BITS
    bits = F.transform(
        vec, lambda x: F.when(x > 0, 1).otherwise(0).cast("long")
    )
    words = []
    for w in range(n_words):
        lo = w * WORD_BITS
        width = min(WORD_BITS, dim - lo)
        word = F.aggregate(
            F.slice(bits, lo + 1, width),
            F.lit(0).cast("long"),
            lambda acc, x: acc * F.lit(2) + x,
        )
        # zero-pad a short final word to keep bit weights aligned
        pad = WORD_BITS - width
        if pad:
            word = word * F.lit(2**pad)
        words.append(word)
    return F.array(*words)


def hamming_dist(a: Column, b: Column) -> Column:
    """Hamming distance between two packed word arrays:
    sum over words of bit_count(xor). Pure integer codegen."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def hamming_knn(
    test: DataFrame,
    train: DataFrame,
    k: int,
    dim: int,
    qid_col: str = "qid",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Exact top-k in Hamming space over sign-binarized embeddings.
    Returns (qid, rank, id, hdist) with (hdist, id) total ordering.

    Plan shape: both sides project to packed words at the scan (32x less
    data through the join than raw floats), the query side broadcasts,
    and the per-query top-k is the standard rank-window partial top-k."""
    t = test.select(
        F.col(qid_col).alias("qid"),
        binarize_pack(F.col(vec_col), dim).alias("qw"),
    )
    c = train.select(
        F.col(id_col).alias("id"),
        binarize_pack(F.col(vec_col), dim).alias("cw"),
    )
    scored = F.broadcast(t).crossJoin(c).select(
        "qid", "id", hamming_dist(F.col("qw"), F.col("cw")).alias("hdist")
    )
    w = Window.partitionBy("qid").orderBy(F.col("hdist").asc(), F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "hdist")
    )


def hamming_shortlist_knn(
    test: DataFrame,
    train: DataFrame,
    k: int,
    dim: int,
    candidate_factor: int = 8,
    qid_col: str = "qid",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Two-stage binary-shortlist ANN (the RaBitQ/BQ pattern): a Hamming
    scan over packed sign bits selects ``candidate_factor * k``
    candidates per query, then an exact float64 re-rank orders them.
    Returns (qid, rank, id, dist) with exact distances.

    Scale shape: stage 1 reads dim/8 bytes per corpus row (vs 4*dim for
    floats) in pure integer codegen; only shortlist rows join back to
    raw vectors (id-bucketed storage prunes that join to ~cf*k*Q rows)."""
    from vector_index_spark.functions.distance import l2sq_arrow

    shortlist = hamming_knn(
        test, train, candidate_factor * k, dim, qid_col, id_col, vec_col
    ).select("qid", "id")
    rescored = (
        shortlist.join(
            train.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__tv")),
            "id",
        )
        .join(
            F.broadcast(
                test.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("__qv"))
            ),
            "qid",
        )
        .select("qid", "id", l2sq_arrow()(F.col("__qv"), F.col("__tv")).alias("dist"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "dist")
    )
