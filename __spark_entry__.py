"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (exact kNN over embeddings at sf0.001).
``queries()`` — one entry per implemented operator from SURVEY.md §2C.
``oracle_sql()`` — DuckDB-equivalent SQL per query (same column names; the
driver compares row count + schema + order-insensitive value hash).

Float contract: every floating-point output column is rounded to 6 decimals
on BOTH sides; distances are float64 with strict left-to-right accumulation
(see vector_index_spark/functions/distance.py). Ordering contract: ties are
broken by id everywhere (SURVEY §7).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_index_spark.functions.distance import cos_dist, ip_dist, l2sq
from vector_index_spark.operators.knn import knn_join, two_phase_knn
from vector_index_spark.operators.recall import recall_total
from vector_index_spark.operators.shard import assign_shards, shard_stats

K = 10
SUB_INDEX_BOUND = 100  # small shards so sf0.01's 500 vectors span 5 shards


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus = embeddings rows with vec_id % 10 != 0 (train/test split is
    deterministic so the DuckDB oracle can replicate it)."""
    return (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 10 != 0)
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    )


def _test(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 10 == 0)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("vec"))
    )


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    a = emb.select(F.col("vec_id").alias("aid"), F.col("embedding").alias("a"))
    b = emb.select(F.col("vec_id").alias("bid"), F.col("embedding").alias("b"))
    return a.join(b, F.col("bid") == (F.col("aid") + 1) % F.lit(n))


_PAIRS_SQL = """
  SELECT a.vec_id AS aid, b.vec_id AS bid,
         a.embedding::DOUBLE[] AS a, b.embedding::DOUBLE[] AS b
  FROM embeddings a
  JOIN embeddings b
    ON b.vec_id = (a.vec_id + 1) % (SELECT count(*) FROM embeddings)
"""

_L2SQ_SQL = "list_sum(list_transform(list_zip({a}, {b}), p -> (p[1]-p[2])*(p[1]-p[2])))"

_KNN_BASE_SQL = f"""
  WITH train AS (
    SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings WHERE vec_id % 10 <> 0
  ), test AS (
    SELECT vec_id AS qid, embedding::DOUBLE[] AS vec FROM embeddings WHERE vec_id % 10 = 0
  ), d AS (
    SELECT t.qid, c.id, {_L2SQ_SQL.format(a="t.vec", b="c.vec")} AS dist
    FROM test t CROSS JOIN train c
  ), ranked AS (
    SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank
    FROM d
  )
"""


# --------------------------------------------------------------------------
# entry
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact kNN (k=10) of the held-out embeddings against the
    corpus at sf0.001 — the reference's core query (top-k ANN search,
    source/dehnsw.h:512-529) in its exact, oracle-checkable form."""
    sf_dir = "/root/testdata/sf0.001"
    return knn_join(_test(spark, sf_dir), _train(spark, sf_dir), K).select(
        "qid",
        F.col("rank").cast("long").alias("rank"),
        "id",
        F.round("dist", 6).alias("dist"),
    )


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q01_l2sq_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2C Q1 — squared-L2 distance column (reference
    source/distance.h:128-135: no sqrt)."""
    p = _pairs(spark, sf_dir)
    return p.select(
        "aid", "bid", F.round(l2sq(F.col("a"), F.col("b")), 6).alias("l2sq")
    )


def q02_ip_cos_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2C Q2 — inner-product & cosine distance columns
    (source/distance.h:143-151, 158-170 — dead code in the reference,
    fully dispatched here)."""
    p = _pairs(spark, sf_dir)
    return p.select(
        "aid",
        "bid",
        F.round(ip_dist(F.col("a"), F.col("b")), 6).alias("ip_dist"),
        F.round(cos_dist(F.col("a"), F.col("b")), 6).alias("cos_dist"),
    )


def q03_knn_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2C Q3 — exact top-k neighbor ids per query, the reference
    binding's output shape (python_binding/dehnswpy.cpp:23-36: ids only,
    ascending distance)."""
    res = knn_join(_test(spark, sf_dir), _train(spark, sf_dir), K)
    return res.select(
        "qid",
        (F.col("rank") - 1).cast("long").alias("pos"),
        F.col("id").alias("neighbor_id"),
    )


def q04_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2C Q4 — exact kNN as a join returning (qid, rank, id, dist)."""
    res = knn_join(_test(spark, sf_dir), _train(spark, sf_dir), K)
    return res.select(
        "qid",
        F.col("rank").cast("long").alias("rank"),
        "id",
        F.round("dist", 6).alias("dist"),
    )


def q05_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2C Q5 — shard assignment + per-shard stats
    (source/dehnsw.h:599-609 semantics)."""
    sharded = assign_shards(_train(spark, sf_dir), SUB_INDEX_BOUND)
    return shard_stats(sharded).select(
        "shard",
        F.col("n_vectors").cast("long").alias("n_vectors"),
        "entry_id",
        "max_id",
    )


def q06_two_phase_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2C Q6 — per-shard top-k then global merge-k; result must
    equal Q4 (the corrected multi-shard query, source/dehnsw.h:532-587)."""
    sharded = assign_shards(_train(spark, sf_dir), SUB_INDEX_BOUND)
    res = two_phase_knn(_test(spark, sf_dir), sharded, K)
    return res.select(
        "qid",
        F.col("rank").cast("long").alias("rank"),
        "id",
        F.round("dist", 6).alias("dist"),
    )


def q07_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2C Q7 — the reference's distance-threshold recall scoring
    (example/dehnsw_example.cpp:26-44), scoring the two-phase result against
    the single-phase result as ground truth (must be total recall)."""
    train, test = _train(spark, sf_dir), _test(spark, sf_dir)
    exact = knn_join(test, train, K)
    neighbors = exact.select(
        "qid",
        (F.col("rank") - 1).alias("pos"),
        F.col("id").alias("neighbor_id"),
        "dist",
    )
    sharded = assign_shards(train, SUB_INDEX_BOUND)
    results = two_phase_knn(test, sharded, K)
    return recall_total(results, neighbors).select(
        F.col("total_hit").cast("long").alias("total_hit"),
        F.col("max_hit").cast("long").alias("max_hit"),
        F.round("recall", 6).alias("recall"),
    )


def q11_star_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2C Q11 — relational substrate proof: lineitem ⋈ orders ⋈
    customer, group-by market segment + return flag, sum/avg/count."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_l2sq_pairs": q01_l2sq_pairs,
        "q02_ip_cos_pairs": q02_ip_cos_pairs,
        "q03_knn_ids": q03_knn_ids,
        "q04_knn_join": q04_knn_join,
        "q05_shard_stats": q05_shard_stats,
        "q06_two_phase_knn": q06_two_phase_knn,
        "q07_recall": q07_recall,
        "q11_star_agg": q11_star_agg,
    }


# --------------------------------------------------------------------------
# oracles
# --------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    return {
        "q01_l2sq_pairs": f"""
            WITH pairs AS ({_PAIRS_SQL})
            SELECT aid, bid,
                   round({_L2SQ_SQL.format(a="a", b="b")}, 6) AS l2sq
            FROM pairs
        """,
        "q02_ip_cos_pairs": f"""
            WITH pairs AS ({_PAIRS_SQL})
            SELECT aid, bid,
                   round(1.0 - list_inner_product(a, b), 6) AS ip_dist,
                   round(1.0 - list_cosine_similarity(a, b), 6) AS cos_dist
            FROM pairs
        """,
        "q03_knn_ids": _KNN_BASE_SQL
        + f"""
            SELECT qid, rank - 1 AS pos, id AS neighbor_id
            FROM ranked WHERE rank <= {K}
        """,
        "q04_knn_join": _KNN_BASE_SQL
        + f"""
            SELECT qid, rank, id, round(dist, 6) AS dist
            FROM ranked WHERE rank <= {K}
        """,
        "q05_shard_stats": f"""
            SELECT vec_id // {SUB_INDEX_BOUND} AS shard,
                   count(*) AS n_vectors,
                   min(vec_id) AS entry_id,
                   max(vec_id) AS max_id
            FROM embeddings WHERE vec_id % 10 <> 0
            GROUP BY 1
        """,
        "q06_two_phase_knn": _KNN_BASE_SQL
        + f"""
            SELECT qid, rank, id, round(dist, 6) AS dist
            FROM ranked WHERE rank <= {K}
        """,
        "q07_recall": f"""
            {_KNN_BASE_SQL}
            SELECT count(*) AS total_hit, count(*) AS max_hit, 1.0::DOUBLE AS recall
            FROM ranked WHERE rank <= {K}
        """,
        "q11_star_agg": """
            SELECT c.c_mktsegment, l.l_returnflag,
                   count(*) AS n_rows,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
                   round(avg(l.l_quantity), 6) AS avg_qty,
                   count(DISTINCT o.o_orderkey) AS n_orders
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        """,
    }
