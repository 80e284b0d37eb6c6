"""BM25 lexical scoring and BM25+vector hybrid search (reciprocal-rank
fusion) — the lexical half of the modern retrieval stack, next to the
ANN routes.

BM25 (Robertson-Sparck Jones; the Lucene practical form) is pure
relational algebra over a (doc, term, tf) posting relation: document
frequencies are a tiny aggregate (vocabulary-sized, broadcastable),
scores are one join + one per-doc sum. Everything stays in Catalyst —
tokenize/explode/aggregate/join — so the plan is two hash aggregates
and a broadcast join, no Python anywhere.

Scale shape (100 TB corpus): the postings relation shuffles once on
(doc, term) at build time and should be persisted bucketed by term; a
query then touches only its terms' postings (partition pruning on the
term key). Document frequencies and the query term set are KBs —
always broadcast. Hybrid fusion joins two k-row-per-query rankings —
negligible.

``hybrid_search`` fuses a BM25 ranking with a vector kNN ranking by
reciprocal-rank fusion (Cormack et al. 2009): score = sum over systems
of 1/(rrf_k + rank); docs missing from one system's top-k contribute
nothing from it. RRF needs no score calibration between systems, which
is why it is the default fusion in production hybrid retrieval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_index_spark.functions.text import tokens

K1 = 1.2
B = 0.75
RRF_K = 60


def bm25_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Build the BM25 index relations: postings (doc_id, term, tf,
    dl) and stats (term, df_t, n_docs, avgdl — denormalized onto every
    term row so a query needs a single broadcast).

    Persist postings bucketed/partitioned by term at scale."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    postings = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .join(dl, "doc_id")
    )
    n_docs = df.count()
    avgdl_row = dl.agg(F.avg("dl")).first()[0]
    stats = (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_t"))
        .withColumn("n_docs", F.lit(int(n_docs)))
        .withColumn("avgdl", F.lit(float(avgdl_row)))
    )
    return postings, stats


def bm25_score(
    postings: DataFrame,
    stats: DataFrame,
    query_terms: list[str],
    k: int | None = None,
) -> DataFrame:
    """Score documents against ``query_terms``; returns (doc_id, score)
    — all matching docs, or the top ``k`` by (score desc, doc_id asc)
    with a ``rank`` column when ``k`` is given.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the Lucene form — always
    positive); per-term contribution = idf * tf*(k1+1) /
    (tf + k1*(1 - b + b*dl/avgdl))."""
    terms = postings.sparkSession.createDataFrame(
        [(t,) for t in sorted(set(query_terms))], "term string"
    )
    matched = postings.join(F.broadcast(terms), "term").join(
        F.broadcast(stats), "term"
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    )
    contrib = idf * (
        F.col("tf")
        * (K1 + 1.0)
        / (
            F.col("tf")
            + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        matched.select("doc_id", contrib.alias("c"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("c"), 6).alias("score"))
    )
    if k is None:
        return scored
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "doc_id", "score")
    )


def hybrid_search(
    lexical: DataFrame,
    vector: DataFrame,
    k: int,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Reciprocal-rank fusion of two rankings.

    ``lexical``: (rank, doc_id, ...) from bm25_score(k=...);
    ``vector``: (rank, id, ...) from any kNN route (single query).
    Returns the fused top-k (rank, doc_id, rrf_score)."""
    lx = lexical.select(F.col("doc_id"), F.col("rank").alias("rank_lex"))
    vx = vector.select(
        F.col("id").alias("doc_id"), F.col("rank").alias("rank_vec")
    )
    fused = lx.join(vx, "doc_id", "full_outer").select(
        "doc_id",
        F.round(
            F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rank_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rank_vec")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "doc_id", "rrf_score")
    )


def tfidf_keywords(
    df: DataFrame,
    top_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document keyword extraction by TF-IDF: score = tf * ln(N/df),
    top ``top_n`` terms per doc by (score desc, term asc).

    Plan shape: the postings build is the only corpus shuffle; the tiny
    per-term df relation broadcasts back onto postings, and the per-doc
    top-n is a WindowGroupLimit partitioned on doc_id — partial top-n
    runs map-side, so the final shuffle carries <= top_n rows per doc.
    Returns (doc_id, rank, term, score), score rounded to 6 decimals.
    """
    postings, stats = bm25_postings(df, text_col=text_col, id_col=id_col)
    scored = postings.join(
        F.broadcast(stats.select("term", "df_t", "n_docs")), "term"
    ).select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.col("n_docs") / F.col("df_t")), 6
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("doc_id", "rank", "term", "score")
    )
