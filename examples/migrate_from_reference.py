"""Migration path for a reference (dehnsw) user: take the same binary
dataset files the C++ harness reads (example/dehnsw_example.cpp:143-145 —
train / test / neighbors in the two-uint64-header row-major format), and
run the full workflow on this engine:

    binary files -> splittable ingest -> bulk index build -> ANN query
    -> recall against the shipped ground truth -> Parquet index

Run:  PYTHONPATH=. python examples/migrate_from_reference.py \
          train.bin test.bin neighbors.bin
(With no args, generates a small synthetic triple first so the script is
self-contained.)
"""

from __future__ import annotations

import struct
import sys
import tempfile
import time

import numpy as np
from pyspark.sql import functions as F

from vector_index_spark import IndexParameters, VectorIndex, get_spark
from vector_index_spark.operators.knn import distance_column
from vector_index_spark.operators.recall import recall_total
from vector_index_spark.sources.annb_datasource import AnnbDataSource
from vector_index_spark.sources.loaders import load_annb_neighbors

K = 10


def _write_bin(path: str, mat: np.ndarray) -> None:
    with open(path, "wb") as fh:
        fh.write(struct.pack("<QQ", *mat.shape))
        mat.tofile(fh)


def _make_synthetic_triple(tmp: str) -> tuple[str, str, str]:
    """Small stand-in for the ann-benchmarks downloads (data/*/readme)."""
    rng = np.random.default_rng(42)
    train = rng.standard_normal((2000, 32)).astype(np.float32)
    test = rng.standard_normal((200, 32)).astype(np.float32)
    # exact ground truth, reference ordering (dist asc, id asc)
    d = ((train[None, :, :] - test[:, None, :]) ** 2).sum(axis=2)
    order = np.lexsort((np.arange(len(train))[None, :].repeat(len(test), 0), d), axis=1)
    neighbors = order[:, :K].astype(np.uint64)
    paths = (f"{tmp}/train.bin", f"{tmp}/test.bin", f"{tmp}/neighbors.bin")
    _write_bin(paths[0], train)
    _write_bin(paths[1], test)
    _write_bin(paths[2], neighbors)
    return paths


def main(argv: list[str], spark=None) -> float:
    """Run the migration workflow; returns the measured recall. Pass an
    existing ``spark`` (e.g. from a test) to reuse a session — the script
    only stops sessions it created itself."""
    own_session = spark is None
    if own_session:
        spark = get_spark(app_name="migrate-from-reference")
        spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(AnnbDataSource)

    if len(argv) == 3:
        train_bin, test_bin, neighbors_bin = argv
    else:
        tmp = tempfile.mkdtemp()
        train_bin, test_bin, neighbors_bin = _make_synthetic_triple(tmp)
        print(f"(no files given — synthetic triple in {tmp})")

    # 1. ingest the reference's binary files, executor-parallel
    train = spark.read.format("annb").option("path", train_bin).load()
    test = (
        spark.read.format("annb").option("path", test_bin).load()
        .select(F.col("id").alias("qid"), "vec")
    )
    gt = load_annb_neighbors(spark, neighbors_bin)
    dim = len(train.select("vec").first().vec)
    n = train.count()
    print(f"ingested: corpus={n} x {dim}d, queries={test.count()}")

    # 2. bulk build (reference: insert loop; here: shard-parallel)
    params = IndexParameters(
        dimension=dim, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=max(n // 8, 1000),
    )
    t0 = time.perf_counter()
    idx = VectorIndex.build(train, params)
    idx.edges.cache().count()
    print(f"index built in {time.perf_counter()-t0:.1f}s")

    # 3. query + recall against the SHIPPED ground truth (the reference's
    # verify protocol: distances of ground-truth ids computed exactly)
    ref_answers = (
        gt.join(train.select(F.col("id").alias("neighbor_id"), "vec"), "neighbor_id")
        .join(test.select("qid", F.col("vec").alias("qvec")), "qid")
        .select(
            "qid", "pos", "neighbor_id",
            distance_column("euclidean2", F.col("qvec"), F.col("vec")).alias("dist"),
        )
    )
    t0 = time.perf_counter()
    res = idx.query(test, K, relaxed_monotonicity=128)
    r = recall_total(res, ref_answers).collect()[0]
    dt = time.perf_counter() - t0
    print(
        f"query: {dt:.1f}s, total_hit={r.total_hit}/{r.max_hit} "
        f"recall={r.recall:.4f}"
    )

    # 4. persist as the shard-partitioned Parquet index
    out = tempfile.mkdtemp() + "/index"
    idx.save(out)
    print(f"index persisted to {out} (params.json + vectors/ + edges/)")
    assert r.recall >= 0.95
    if own_session:
        spark.stop()
    return r.recall


if __name__ == "__main__":
    main(sys.argv[1:])
