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

def test_annb_frames_bit_exact(spark):
    """HDF5 ingest minus the h5py read: annb_frames must preserve float32
    values bit-exactly and assign row-index ids (reference id convention,
    example/example.py:66-102)."""
    import numpy as np

    from vector_index_spark.sources.loaders import annb_frames

    rng = np.random.default_rng(11)
    train = rng.standard_normal((7, 5)).astype(np.float32)
    test = rng.standard_normal((3, 5)).astype(np.float32)
    t, q = annb_frames(spark, train, test)
    trows = {r.id: r.vec for r in t.collect()}
    qrows = {r.qid: r.vec for r in q.collect()}
    assert sorted(trows) == list(range(7)) and sorted(qrows) == list(range(3))
    for i in range(7):
        assert np.array_equal(np.asarray(trows[i], dtype=np.float32), train[i])
    for i in range(3):
        assert np.array_equal(np.asarray(qrows[i], dtype=np.float32), test[i])


def test_annb_hdf5_gate_or_roundtrip(spark, tmp_path):
    """With h5py present: full write->load round-trip; without it: the
    documented ImportError gate (not a silent wrong answer)."""
    import numpy as np
    import pytest as _pytest

    from vector_index_spark.sources.loaders import load_annb_hdf5

    try:
        import h5py  # type: ignore
    except ImportError:
        with _pytest.raises(ImportError, match="h5py"):
            load_annb_hdf5(spark, str(tmp_path / "missing.hdf5"))
        return
    rng = np.random.default_rng(13)
    train = rng.standard_normal((6, 4)).astype(np.float32)
    test = rng.standard_normal((2, 4)).astype(np.float32)
    path = str(tmp_path / "annb.hdf5")
    with h5py.File(path, "w") as f:
        f["train"] = train
        f["test"] = test
    t, q = load_annb_hdf5(spark, path)
    got = np.stack([r.vec for r in t.orderBy("id").collect()]).astype(np.float32)
    assert np.array_equal(got, train)
    assert q.count() == 2
