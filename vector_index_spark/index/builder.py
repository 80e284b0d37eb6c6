"""Bulk graph-index build: the Spark driver for per-shard dehnsw
construction.

The reference builds ONE graph, one insert at a time, single-threaded
(source/dehnsw.h:590-663). Here the dataset is sharded by
``id DIV sub_index_bound`` (dehnsw.h:601 semantics) and every shard builds
independently inside an ``applyInPandas`` task — the reference's shard
independence (dehnsw.h:601-609) makes this embarrassingly parallel, which
is exactly the property that scales to a 1000-executor cluster: shard count
= task count, no cross-task coordination, memory per task bounded by
``sub_index_bound * dim * 8`` bytes plus adjacency.

Output is the edge relation (shard, layer, src, dst, dist) with per-node
self-rows carrying the node's top layer (see graph.graph_to_rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_index_spark.config import IndexParameters
from vector_index_spark.index.graph import build_shard_graph, graph_to_rows
from vector_index_spark.operators.shard import assign_shards

EDGE_SCHEMA = (
    "shard long, layer long, src long, dst long, dist double"
)


def build_graph_index(
    vectors: DataFrame,
    params: IndexParameters,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Build the sharded graph index; returns the edge relation.

    Insertion order within a shard is id order (the reference's
    global_offset = insertion order, dehnsw.h:599), so the build is
    deterministic given the input table.
    """
    connect = params.minimum_connect_number
    patience = params.relaxed_monotonicity
    step = params.step

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        ids = pdf["id"].to_numpy(dtype=np.int64)
        shard = int(pdf["shard"].iloc[0])
        g = build_shard_graph(X, ids, connect, patience, step)
        rows = graph_to_rows(g, shard)
        return pd.DataFrame(
            rows, columns=["shard", "layer", "src", "dst", "dist"]
        )

    sharded = assign_shards(
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
        params.sub_index_bound,
    )
    return sharded.groupBy("shard").applyInPandas(build, EDGE_SCHEMA)
