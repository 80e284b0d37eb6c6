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


def test_annb_hdf5_roundtrip(spark, tmp_path):
    """Full .hdf5 -> DataFrames round-trip. Writes with h5py when present
    (cross-implementation interop), else with the spec-derived minihdf5
    writer; load_annb_hdf5 must recover the float32 matrices bit-exactly
    either way (reference op #24, example/example.py:66-102)."""
    import numpy as np

    from vector_index_spark.sources.loaders import load_annb_hdf5

    rng = np.random.default_rng(13)
    train = rng.standard_normal((6, 4)).astype(np.float32)
    test = rng.standard_normal((2, 4)).astype(np.float32)
    path = str(tmp_path / "annb.hdf5")
    try:
        import h5py  # type: ignore

        with h5py.File(path, "w") as f:
            f["train"] = train
            f["test"] = test
    except ImportError:
        from vector_index_spark.sources.minihdf5 import write_hdf5

        write_hdf5(path, {"train": train, "test": test})
    t, q = load_annb_hdf5(spark, path)
    got = np.stack([r.vec for r in t.orderBy("id").collect()]).astype(np.float32)
    assert np.array_equal(got, train)
    assert q.count() == 2


def test_minihdf5_roundtrip_dtypes(tmp_path):
    """Pure-python HDF5 subset: float32/float64/int64 datasets round-trip
    bit-exactly, and non-HDF5 input fails loudly."""
    import numpy as np
    import pytest as _pytest

    from vector_index_spark.sources.minihdf5 import read_hdf5, write_hdf5

    rng = np.random.default_rng(5)
    data = {
        "train": rng.standard_normal((100, 16)).astype(np.float32),
        "distances": rng.standard_normal((10, 5)),
        "neighbors": rng.integers(0, 1000, (10, 5)).astype(np.int64),
        "flat": rng.standard_normal(17).astype(np.float32),
    }
    for compress in (False, True):
        path = str(tmp_path / f"mini_{compress}.hdf5")
        write_hdf5(path, data, compress=compress, chunk_rows=7)
        back = read_hdf5(path)
        assert sorted(back) == sorted(data)
        for name, arr in data.items():
            assert back[name].dtype == arr.dtype, name
            assert np.array_equal(back[name], arr), name

    bad = tmp_path / "not_hdf5.bin"
    bad.write_bytes(b"parquet-or-something" * 4)
    with _pytest.raises(NotImplementedError, match="signature"):
        read_hdf5(str(bad))


def test_minihdf5_superblock_v2(tmp_path):
    """Superblock v2 + v2 OHDR fixture (h5py libver='latest' shape,
    hand-built because h5py isn't in the container): the root object
    header address sits at byte 36 of a v2 superblock (byte 28 is the
    EOF address), and a v2 OHDR with the timestamps flag carries FOUR
    4-byte times (16 bytes) before the chunk-0 size (ADVICE r02 #1/#2).
    The fixture grafts both onto a writer-produced file: a v2 root OHDR
    (flags 0x20, symbol-table message reusing the v0 file's B-tree +
    heap) and a 48-byte v2 superblock, then requires bit-exact reads."""
    import struct

    import numpy as np

    from vector_index_spark.sources import minihdf5
    from vector_index_spark.sources.minihdf5 import read_hdf5, write_hdf5

    rng = np.random.default_rng(7)
    data = {
        "train": rng.standard_normal((20, 8)).astype(np.float32),
        "neighbors": rng.integers(0, 100, (5, 3)).astype(np.int64),
    }
    path = tmp_path / "v0.hdf5"
    write_hdf5(str(path), data)
    buf = bytearray(path.read_bytes())

    # pull the root symbol-table message (btree, heap) out of the v0 file
    rd = minihdf5._Reader(bytes(buf))
    st = [
        struct.unpack_from("<QQ", bytes(buf), body)
        for mtype, body, _ in rd._messages(rd.root_oh)
        if mtype == 0x11
    ]
    assert st, "v0 fixture has no symbol table message"
    btree, heap = st[0]

    # append a v2 OHDR root group: flags 0x20 (times present, 1-byte
    # chunk0 size), 16 bytes of times, chunk0 = one symbol-table message
    root2 = len(buf)
    msg = bytes([0x11]) + struct.pack("<H", 16) + b"\x00" + struct.pack("<QQ", btree, heap)
    buf += b"OHDR" + bytes([2, 0x20]) + b"\x00" * 16 + bytes([len(msg)]) + msg
    eof = len(buf)

    # overwrite the head with a 48-byte v2 superblock (the v0 superblock
    # region is >= 64 bytes, so nothing live is clobbered)
    sb2 = (
        b"\x89HDF\r\n\x1a\n"
        + bytes([2, 8, 8, 0])
        + struct.pack("<QQQQ", 0, minihdf5.UNDEF, eof, root2)
        + b"\x00\x00\x00\x00"  # checksum (reader does not verify)
    )
    buf[: len(sb2)] = sb2
    v2path = tmp_path / "v2.hdf5"
    v2path.write_bytes(bytes(buf))

    back = read_hdf5(str(v2path))
    assert sorted(back) == sorted(data)
    for name, arr in data.items():
        assert back[name].dtype == arr.dtype, name
        assert np.array_equal(back[name], arr), name
