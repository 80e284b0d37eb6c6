"""Index persistence — the Spark replacement for the reference's custom
binary format (source/dehnsw.h:666-844).

The reference serializes: a header (count + 6 params, dehnsw.h:675-688),
then per shard (count, layer_count, entry point, dehnsw.h:696-700), then per
vector (ids, raw floats, per-layer edges, dehnsw.h:702-733). Here the same
information is a columnar, partition-prunable layout:

    <path>/params.json                         — IndexParameters (the header)
    <path>/vectors/  partitioned by shard      — (shard, id, vec)
    <path>/edges/    partitioned by shard      — (shard, layer, src, dst, dist)

Shard-partitioned Parquet means a query touching one shard reads one
directory (partition pruning), and a 100 TB index loads with zero driver
involvement — ``spark.read.parquet`` is the whole ``load`` (vs the
reference's sequential 106-line deserializer, dehnsw.h:739-844).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from vector_index_spark.config import IndexParameters


def save_index(
    vectors: DataFrame,
    edges: DataFrame | None,
    params: IndexParameters,
    path: str,
    mode: str = "overwrite",
) -> None:
    """Write a sharded index. ``vectors``: (shard, id, vec);
    ``edges``: (shard, layer, src, dst, dist) or None for a flat index."""
    vectors.write.mode(mode).partitionBy("shard").parquet(f"{path}/vectors")
    if edges is not None:
        edges.write.mode(mode).partitionBy("shard").parquet(f"{path}/edges")
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/params.json", "w") as fh:
        fh.write(params.to_json())


def compact_index(spark: SparkSession, path: str, out_path: str) -> None:
    """Rewrite an index compacted: one sorted file per shard partition.

    The Spark analogue of the reference's ``optimize`` deep copy
    (python_binding/dehnswpy.cpp:18-21) — there it defragments the
    allocator after incremental build; here it defragments small files and
    restores intra-partition sort order for better scan locality."""
    vectors, edges, params = load_index(spark, path)
    (
        vectors.repartition("shard")
        .sortWithinPartitions("id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{out_path}/vectors")
    )
    if edges is not None:
        (
            edges.repartition("shard")
            .sortWithinPartitions("layer", "src", "dst")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(f"{out_path}/edges")
        )
    os.makedirs(out_path, exist_ok=True)
    with open(f"{out_path}/params.json", "w") as fh:
        fh.write(params.to_json())


def load_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame | None, IndexParameters]:
    """Inverse of :func:`save_index` (reference ``load``, dehnsw.h:739-844)."""
    params_path = f"{path}/params.json"
    if not os.path.exists(params_path):
        raise FileNotFoundError(
            f"no index at {path!r}: missing {params_path} "
            "(expected a layout written by save_index: params.json + "
            "vectors/ [+ edges/])"
        )
    with open(params_path) as fh:
        params = IndexParameters.from_json(fh.read())
    vectors = spark.read.parquet(f"{path}/vectors")
    edges_path = f"{path}/edges"
    edges = spark.read.parquet(edges_path) if os.path.isdir(edges_path) else None
    return vectors, edges, params


def save_ivfpq(
    encoded: DataFrame,
    centroids: DataFrame,
    codebooks,
    path: str,
    mode: str = "overwrite",
) -> None:
    """Persist an IVF-PQ index (the byte-efficient serving route):

        <path>/encoded/    partitioned by centroid_id — (centroid_id, id, codes)
        <path>/centroids/  — (centroid_id, vec)
        <path>/codebooks.json — (m, n_pq_centroids, sub_dim) nested lists

    The cell partitioning makes probe scans partition-prunable on disk
    exactly as the in-memory route prunes cells; codebooks are kilobytes
    and round-trip exactly through JSON (Python float repr). The RAW
    corpus is deliberately NOT part of the index — compressed routes
    exist so the resident/persisted set is codes, and the exact re-rank
    reads the cold corpus wherever it already lives."""
    import numpy as np

    encoded.write.mode(mode).partitionBy("centroid_id").parquet(f"{path}/encoded")
    centroids.write.mode(mode).parquet(f"{path}/centroids")
    os.makedirs(path, exist_ok=True)
    books = np.asarray(codebooks, dtype=np.float64)
    with open(f"{path}/codebooks.json", "w") as fh:
        json.dump({"shape": list(books.shape), "data": books.ravel().tolist()}, fh)


def load_ivfpq(spark: SparkSession, path: str):
    """Inverse of :func:`save_ivfpq` — returns (encoded, centroids,
    codebooks ndarray)."""
    import numpy as np

    books_path = f"{path}/codebooks.json"
    if not os.path.exists(books_path):
        raise FileNotFoundError(
            f"no IVF-PQ index at {path!r}: missing {books_path} "
            "(expected a layout written by save_ivfpq)"
        )
    with open(books_path) as fh:
        d = json.load(fh)
    books = np.asarray(d["data"], dtype=np.float64).reshape(d["shape"])
    encoded = spark.read.parquet(f"{path}/encoded")
    centroids = spark.read.parquet(f"{path}/centroids")
    return encoded, centroids, books
