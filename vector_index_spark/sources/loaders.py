"""Sources: driver testdata tables, the reference's custom binary vector
format, and (gated) ann-benchmarks HDF5.

The reference reads (a) its own binary dataset format — two uint64 header
words ``count, dimension`` then a row-major payload
(example/dehnsw_example.cpp:46-94) — and (b) ann-benchmarks HDF5 via h5py
(example/example.py:66-102). Both are single-file, driver-parsed here and
immediately handed to Arrow; at scale you convert once to Parquet (the
shard-partitioned index layout) and never touch them again.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TS_NANO_COLS = {"events": ("ts",)}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a driver testdata table, normalizing TIMESTAMP(NANOS) columns
    (read as long under spark.sql.legacy.parquet.nanosAsLong) back to
    timestamps (floor to microseconds — DuckDB does the same truncation)."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in TS_NANO_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            # integer division: / would go through double and lose precision
            # at nanosecond magnitudes (~1e18 > 2^53)
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


def write_results(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Convenience sink for flat result tables (SURVEY §2D: Parquet primary,
    CSV/JSON convenience). Array/vector columns belong in Parquet — CSV and
    JSON are for final flat outputs (ranked ids, stats, recall tables)."""
    writer = df.write.mode("overwrite")
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")


def read_results(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: str | None = None
) -> DataFrame:
    """Inverse of :func:`write_results`. Pass an explicit ``schema`` for
    CSV/JSON — inference is a full extra pass over the data at scale."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "csv":
        return reader.option("header", "true").csv(path)
    if fmt == "json":
        return reader.json(path)
    raise ValueError(f"unsupported format {fmt!r}")


def load_annb_binary(
    spark: SparkSession, path: str, id_start: int = 0
) -> DataFrame:
    """Read the reference's binary vector format into (id, vec).

    Format per example/dehnsw_example.cpp:46-69: uint64 count, uint64
    dimension, then count*dimension float32 row-major."""
    with open(path, "rb") as fh:
        count, dim = struct.unpack("<QQ", fh.read(16))
        data = np.fromfile(fh, dtype=np.float32, count=count * dim)
    mat = data.reshape(count, dim)
    # .tolist() yields Python floats: required so the frame converts under
    # BOTH the Arrow and the non-Arrow createDataFrame paths (the non-Arrow
    # verifier rejects numpy.float32 scalars inside array<float> cells).
    pdf = pd.DataFrame(
        {
            "id": np.arange(id_start, id_start + count, dtype=np.int64),
            "vec": mat.tolist(),
        }
    )
    return spark.createDataFrame(pdf, "id long, vec array<float>")


def load_annb_neighbors(spark: SparkSession, path: str) -> DataFrame:
    """Read the reference's binary ground-truth format into the unnested
    (qid, pos, neighbor_id) relation (dehnsw_example.cpp:71-94: uint64
    count, uint64 k, then count*k uint64 ids)."""
    with open(path, "rb") as fh:
        count, k = struct.unpack("<QQ", fh.read(16))
        ids = np.fromfile(fh, dtype=np.uint64, count=count * k).astype(np.int64)
    mat = ids.reshape(count, k)
    qid = np.repeat(np.arange(count, dtype=np.int64), k)
    pos = np.tile(np.arange(k, dtype=np.int64), count)
    pdf = pd.DataFrame({"qid": qid, "pos": pos, "neighbor_id": mat.reshape(-1)})
    return spark.createDataFrame(pdf, "qid long, pos long, neighbor_id long")


def annb_frames(spark: SparkSession, train: np.ndarray, test: np.ndarray):
    """ann-benchmarks matrices -> (corpus, queries) DataFrames with the
    reference's id convention (row index = id, example/example.py:66-102).
    Factored out of load_annb_hdf5 so the conversion is testable bit-exactly
    without h5py; only the literal ``h5py.File`` reads remain gated."""
    train = np.asarray(train, dtype=np.float32)
    test = np.asarray(test, dtype=np.float32)
    # .tolist() (Python floats) keeps the frames valid for the non-Arrow
    # createDataFrame path as well as the Arrow one — see load_annb_binary.
    t = pd.DataFrame({"id": np.arange(len(train)), "vec": train.tolist()})
    q = pd.DataFrame({"qid": np.arange(len(test)), "vec": test.tolist()})
    return (
        spark.createDataFrame(t, "id long, vec array<float>"),
        spark.createDataFrame(q, "qid long, vec array<float>"),
    )


def load_annb_hdf5(spark: SparkSession, path: str):
    """ann-benchmarks HDF5 ingest (reference example/example.py:66-102).

    Uses h5py when present (full format coverage); otherwise falls back to
    the pure-python subset reader (sources.minihdf5 — superblock v0/v2,
    contiguous or deflate-chunked fixed int/float datasets, the layout
    libhdf5 writes for these files). Unsupported features raise
    NotImplementedError, never a silent wrong answer."""
    try:
        import h5py  # type: ignore
    except ImportError:
        from vector_index_spark.sources.minihdf5 import read_hdf5

        data = read_hdf5(path)
        return annb_frames(spark, data["train"], data["test"])
    with h5py.File(path, "r") as f:  # pragma: no cover
        train = np.asarray(f["train"], dtype=np.float32)
        test = np.asarray(f["test"], dtype=np.float32)
    return annb_frames(spark, train, test)
