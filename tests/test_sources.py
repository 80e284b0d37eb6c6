from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from vector_index_spark.operators.knn import knn_join
from vector_index_spark.sources.loaders import (
    load_annb_binary,
    load_annb_neighbors,
    read_results,
    write_results,
)


def test_annb_binary_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(3)
    M = rng.standard_normal((11, 16)).astype(np.float32)
    p = str(tmp_path / "vecs.bin")
    with open(p, "wb") as fh:
        fh.write(struct.pack("<QQ", 11, 16))
        M.tofile(fh)
    df = load_annb_binary(spark, p)
    back = np.stack(
        [np.array(r.vec, dtype=np.float32) for r in df.orderBy("id").collect()]
    )
    assert np.array_equal(back, M)


def test_annb_neighbors_unnested(spark, tmp_path):
    N = np.arange(12, dtype=np.uint64).reshape(4, 3)
    p = str(tmp_path / "nb.bin")
    with open(p, "wb") as fh:
        fh.write(struct.pack("<QQ", 4, 3))
        N.tofile(fh)
    df = load_annb_neighbors(spark, p)
    rows = {(r.qid, r.pos): r.neighbor_id for r in df.collect()}
    assert len(rows) == 12
    assert rows[(2, 1)] == 7


def test_annb_python_datasource_splittable(spark, tmp_path):
    from vector_index_spark.sources.annb_datasource import AnnbDataSource

    rng = np.random.default_rng(5)
    M = rng.standard_normal((500, 16)).astype(np.float32)
    p = str(tmp_path / "train.bin")
    with open(p, "wb") as fh:
        fh.write(struct.pack("<QQ", 500, 16))
        M.tofile(fh)
    spark.dataSource.register(AnnbDataSource)
    df = (
        spark.read.format("annb")
        .option("path", p)
        .option("rows_per_partition", "64")
        .load()
    )
    assert df.rdd.getNumPartitions() == 8  # ceil(500/64): splittable source
    rows = df.orderBy("id").collect()
    back = np.stack([np.array(r.vec, dtype=np.float32) for r in rows])
    assert np.array_equal(back, M)


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_results_roundtrip(spark, tmp_path, fmt):
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).limit(5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    res = knn_join(test, train, 3).select(
        "qid", "rank", "id", F.round("dist", 6).alias("dist")
    )
    path = str(tmp_path / f"out_{fmt}")
    write_results(res, path, fmt)
    back = read_results(
        spark, path, fmt, schema="qid long, rank int, id long, dist double"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, res.collect()))