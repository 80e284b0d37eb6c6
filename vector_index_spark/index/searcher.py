"""ANN query over the sharded graph index.

The reference queries shard 0 only (source/dehnsw.h:528 — the multi-shard
fan-out is dead code). Here every shard answers every query in parallel
(cogrouped applyInPandas over vectors + edges, partitioned by shard), then a
global window merge keeps the k best — the corrected form of the dead
``query_with_sub_index`` merge (dehnsw.h:572-580).

The query set is broadcast to every shard task via a Spark broadcast
variable (queries are the small side — reference ratio 100:1), so the only
shuffles are the cogroup on ``shard`` (which partition-prunes if the index
was read from shard-partitioned Parquet) and the final k-row-per-query
merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_index_spark.index.graph import graph_from_rows, query_shard

RESULT_SCHEMA = "qid long, id long, dist double"


def graph_ann_query(
    vectors: DataFrame,
    edges: DataFrame,
    test: DataFrame,
    k: int,
    relaxed_monotonicity: int = 64,
    qid_col: str = "qid",
    vec_col: str = "vec",
) -> DataFrame:
    """Approximate top-k for every test row. Returns (qid, rank, id, dist)
    ordered by (dist, id) per query.

    ``vectors``: (shard, id, vec); ``edges``: (shard, layer, src, dst, dist)
    as produced by builder.build_graph_index.
    """
    spark = vectors.sparkSession
    test_pdf = test.select(
        F.col(qid_col).alias("qid"), F.col(vec_col).alias("vec")
    ).toPandas()
    qids = test_pdf["qid"].to_numpy(dtype=np.int64)
    Q = np.stack(test_pdf["vec"].to_numpy()).astype(np.float64)
    bc = spark.sparkContext.broadcast((qids, Q))

    def search(key, vec_pdf: pd.DataFrame, edge_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(vec_pdf) == 0:
            return pd.DataFrame(columns=["qid", "id", "dist"])
        vec_pdf = vec_pdf.sort_values("id")
        X = np.stack(vec_pdf["vec"].to_numpy()).astype(np.float64)
        ids = vec_pdf["id"].to_numpy(dtype=np.int64)
        erows = edge_pdf[["layer", "src", "dst", "dist"]].to_numpy(dtype=np.float64)
        g = graph_from_rows(X, ids, erows)
        q_ids, q_mat = bc.value
        out_qid: list[int] = []
        out_id: list[int] = []
        out_dist: list[float] = []
        for qi in range(len(q_ids)):
            for d, off in query_shard(g, q_mat[qi], k, relaxed_monotonicity):
                out_qid.append(int(q_ids[qi]))
                out_id.append(int(g.ids[off]))
                out_dist.append(d)
        return pd.DataFrame({"qid": out_qid, "id": out_id, "dist": out_dist})

    per_shard = (
        vectors.select("shard", "id", "vec")
        .groupBy("shard")
        .cogroup(edges.select("shard", "layer", "src", "dst", "dist").groupBy("shard"))
        .applyInPandas(search, RESULT_SCHEMA)
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        per_shard.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "dist")
    )
